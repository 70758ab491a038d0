"""Streaming execution mode: incremental snapshot maintenance, retract
(changelog) emission, watermarked windows, stateful as-of."""
