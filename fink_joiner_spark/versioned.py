"""Versioned multi-dataset parquet store — reader snapshot isolation
for persisted indexes (the round-8 verdict's ask #4).

The in-place index layout mutated live directories via two-rename
partition swaps: correct for a single writer, but a CONCURRENT probe
during the swap window could see cell=5 new + cell=7 old (mixed
state), or list a file mid-rename and die on FileNotFound — and a
multi-dataset maintenance op (vectors + ids + centroids) had no
cross-dataset atomicity at all without the intent-marker protocol.

This store removes the window instead of shrinking it, with the
pattern :class:`fink_joiner_spark.streaming.dedup_stream.SnapshotStore`
already uses for its CDF snapshots, generalized to multiple datasets:

* **Layout** — ``root/v{N:06d}/{dataset}/{part=dirs}`` data
  directories plus a per-version state manifest
  (``v{N}/_state`` parquet: one row per (dataset, part, ref)); a
  version's manifest may REFERENCE partitions written by earlier
  versions, so an O(delta) maintenance op writes only its touched
  partitions and carries every other reference forward — untouched
  files are never rewritten OR moved (file-identity test-asserted).
* **Commit** — one ``mkdirs(root/_commits/c{N:06d})``: directory
  creation is atomic on POSIX and HDFS and an all-or-nothing marker
  object on S3A. Readers resolve max committed N, read ITS manifest,
  and see one consistent version end to end; a writer crash before
  the marker leaves the previous version untouched (re-running the
  op — or any other op — is plain retry, no repair protocol needed).
* **Append as reference** — a pure-append delta (streamed folds) adds
  rows ``(dataset, part, N)`` alongside the part's existing
  references instead of rewriting it: a partition's content is the
  union of its referenced version dirs. Compaction collapses the
  reference lists back to one.
* **GC** — version directories referenced by neither of the last two
  commits are deleted, and commit markers older than those two are
  dropped; a reader that resolved the previous commit keeps a
  consistent view through the next commit (single-flip grace). The
  remaining caveat is MULTI-WRITER coordination (two concurrent
  maintenance ops race to the same version number) — that is the
  Delta/Iceberg upgrade, narrowed from the old "any concurrent
  reader" caveat.

All filesystem side effects go through :class:`fsutil.HadoopFS`, so
the semantics are identical on local disk, HDFS, and S3A. State
manifests are parquet (Spark-native — no driver-side stream I/O
through py4j); their row count is bounded by the store's partition
count (the √n cell rule keeps that ~10⁴ at 100 TB — a trivially
collectable manifest, the same order as a Delta checkpoint's
partition listing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fink_joiner_spark.fsutil import HadoopFS

_STATE_SCHEMA = "dataset string, part string, ref int"


class VersionedStore:
    """One versioned store rooted at ``root``. Single writer; any
    number of concurrent readers."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.fs = HadoopFS(spark, root)

    # -- version resolution -------------------------------------------------

    def _commits_dir(self) -> str:
        return f"{self.root}/_commits"

    def vdir(self, version: int) -> str:
        return f"{self.root}/v{version:06d}"

    def committed_versions(self) -> list[int]:
        if not self.fs.exists(self._commits_dir()):
            return []
        out = []
        for name in self.fs.list_dirs(self._commits_dir()):
            if name.startswith("c") and name[1:].isdigit():
                out.append(int(name[1:]))
        return sorted(out)

    def current(self) -> int | None:
        vs = self.committed_versions()
        return vs[-1] if vs else None

    # -- manifest -----------------------------------------------------------

    def state_rows(self, version: int | None = None) -> list[tuple[str, str, int]]:
        """The manifest of ``version`` (default: current) as python
        tuples — bounded by the store's partition count."""
        if version is None:
            version = self.current()
        if version is None:
            return []
        df = self.spark.read.parquet(f"{self.vdir(version)}/_state")
        return [(r["dataset"], r["part"], int(r["ref"])) for r in df.collect()]

    def parts(self, dataset: str, version: int | None = None) -> dict[str, list[int]]:
        """part-dir name → ordered list of referencing versions."""
        out: dict[str, list[int]] = {}
        for ds, part, ref in self.state_rows(version):
            if ds == dataset:
                out.setdefault(part, []).append(ref)
        for refs in out.values():
            refs.sort()
        return out

    # -- reading ------------------------------------------------------------

    def read(
        self,
        dataset: str,
        parts: list[str] | None = None,
        version: int | None = None,
    ) -> DataFrame | None:
        """One consistent version of ``dataset`` (default: current),
        optionally restricted to the named partition dirs (e.g.
        ``["cell=5", "cell=9"]``) — the versioned analog of partition
        pruning, resolved to explicit directories so the scan never
        lists anything else. Returns None when the dataset has no
        referenced partitions (empty store / fully-retired)."""
        refs = self.parts(dataset, version)
        if parts is not None:
            want = set(parts)
            refs = {p: v for p, v in refs.items() if p in want}
        if not refs:
            return None
        # group dirs by referencing version: one read per version with
        # basePath preserves the partition column; union across the
        # (bounded: GC keeps ≤2 commits of refs live, appends add a
        # few) distinct versions
        by_ref: dict[int, list[str]] = {}
        for part, vs in refs.items():
            for v in vs:
                by_ref.setdefault(v, []).append(
                    f"{self.vdir(v)}/{dataset}/{part}" if part else
                    f"{self.vdir(v)}/{dataset}"
                )
        frames = []
        for v, dirs in sorted(by_ref.items()):
            reader = self.spark.read
            if any("=" in d.rsplit("/", 1)[-1] for d in dirs):
                reader = reader.option("basePath", f"{self.vdir(v)}/{dataset}")
            frames.append(reader.parquet(*sorted(dirs)))
        df = frames[0]
        for f in frames[1:]:
            df = df.unionByName(f)
        return df

    # -- writing ------------------------------------------------------------

    def begin(self) -> int:
        """Next version number; any uncommitted debris of a crashed
        prior attempt at the same number is deleted (it was never
        visible to a reader)."""
        v = (self.current() or 0) + 1
        self.fs.delete(self.vdir(v))
        return v

    def written_parts(self, version: int, dataset: str) -> list[str]:
        """Partition dirs actually produced under
        ``v{version}/{dataset}`` — the rows a writer should reference
        for a partitioned dataset (a partition every row of which was
        deleted produces no dir and silently drops out)."""
        root = f"{self.vdir(version)}/{dataset}"
        if not self.fs.exists(root):
            return []
        return sorted(
            d for d in self.fs.list_dirs(root) if "=" in d
        )

    def commit(self, version: int, rows: list[tuple[str, str, int]]) -> None:
        """Write the manifest, flip the commit marker (THE atomic
        point), GC unreferenced versions."""
        self.spark.createDataFrame(rows, _STATE_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{self.vdir(version)}/_state")
        self.fs.mkdirs(f"{self._commits_dir()}/c{version:06d}")
        self.gc()

    # manifest-composition helpers for writers ------------------------------

    def carry_except(
        self,
        old: list[tuple[str, str, int]],
        dataset: str,
        parts: set[str],
    ) -> list[tuple[str, str, int]]:
        """``old`` minus every reference to (dataset, part ∈ parts) —
        the replace-refs half of an O(delta) rewrite."""
        return [r for r in old if not (r[0] == dataset and r[1] in parts)]

    # -- GC -----------------------------------------------------------------

    def gc(self) -> None:
        """Keep every version dir referenced by the last TWO commits
        (the previous commit stays readable through one flip); delete
        the rest and any older commit markers. Annotation rows
        (dataset starting with ``_``, e.g. the stream sinks'
        ``_applied`` batch markers) reference no directories and must
        NOT pin their recording version alive."""
        vs = self.committed_versions()
        keep_commits = vs[-2:]
        live: set[int] = set(keep_commits)
        for c in keep_commits:
            live.update(
                ref for ds, _, ref in self.state_rows(c)
                if not ds.startswith("_")
            )
        for name in self.fs.list_dirs(self.root):
            if name.startswith("v") and name[1:].isdigit():
                if int(name[1:]) not in live:
                    self.fs.delete(f"{self.root}/{name}")
        for c in vs[:-2]:
            self.fs.delete(f"{self._commits_dir()}/c{c:06d}")
