"""Filesystem side effects through the Hadoop FileSystem API.

Lake maintenance (the versioned store's commit markers and GC,
generic partitioned-dataset compaction staging/swap) needs
exists/mkdirs/rename/delete against the SAME filesystem the datasets
live on. Python's ``os``/``shutil`` only see the driver's local disk:
``os.path.exists("s3a://…")`` is always False and ``os.rename`` on a
URI raises — on HDFS/S3 (the stated 100 TB posture) a local-FS marker
check silently re-folds replayed micro-batches and a local rename
crashes compaction outright.

Every helper here resolves the ``org.apache.hadoop.fs.FileSystem``
for the path's OWN scheme (``file:``, ``hdfs:``, ``s3a:``, …) via the
active session's Hadoop configuration, so the semantics are identical
on a laptop and a 1000-executor cluster. These are driver-side
metadata operations (one py4j call each) on a bounded number of paths
— markers, partition directories, dataset roots — never per-row or
per-file-of-a-large-scan work.

Atomicity caveat for the in-place swap helpers below: ``rename`` is
atomic on HDFS and POSIX but copy+delete on S3A, and a concurrent
reader during a swap window can see a mixed state — which is exactly
why the persisted indexes moved OFF these helpers onto
:mod:`fink_joiner_spark.versioned` (round 9). The swap machinery
remains for generic lake datasets with an exclusive maintenance
window (`lake.compact_partitioned`).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _is_already_exists(je) -> bool:
    """True when a py4j-surfaced java exception means "the destination
    file already existed" — the lost-CAS outcome of an exclusive
    create. The local FS and HDFS raise `FileAlreadyExistsException`
    at the top level, but RPC'd filesystems wrap it (HDFS client can
    surface an un-unwrapped `RemoteException`; object-store connectors
    type the conflict differently), so walk the cause chain and fall
    back to the message text before declaring a real failure —
    otherwise a benign lease/staging CAS loss turns into an op error
    on those backends. Commit markers stay fail-safe either way (abort
    is marker-aware)."""
    seen = 0
    while je is not None and seen < 8:
        try:
            if "AlreadyExists" in je.getClass().getName():
                return True
            msg = je.getMessage()
            if msg is not None and "already exists" in str(msg).lower():
                return True
            je = je.getCause()
        except Exception:  # noqa: BLE001 — defensive over py4j refs
            return False
        seen += 1
    return False


class HadoopFS:
    """Thin wrapper over ``org.apache.hadoop.fs.FileSystem`` for one
    base path's scheme. Methods accept plain path strings (any scheme
    resolvable by the session's Hadoop conf)."""

    def __init__(self, spark: SparkSession, base_path: str):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()
        self._fs = self._path(base_path).getFileSystem(self._conf)

    def _path(self, p: str):
        return self._jvm.org.apache.hadoop.fs.Path(p)

    def exists(self, p: str) -> bool:
        return bool(self._fs.exists(self._path(p)))

    def mkdirs(self, p: str) -> bool:
        return bool(self._fs.mkdirs(self._path(p)))

    def rename(self, src: str, dst: str) -> bool:
        """FileSystem.rename — atomic dir move on HDFS/POSIX. Returns
        False (does not raise) when src is missing or dst exists; the
        callers that need must-succeed semantics check the result."""
        return bool(self._fs.rename(self._path(src), self._path(dst)))

    def delete(self, p: str, recursive: bool = True) -> bool:
        """Delete if present; False when the path didn't exist."""
        return bool(self._fs.delete(self._path(p), recursive))

    def file_bytes(self, p: str) -> int:
        return int(self._fs.getFileStatus(self._path(p)).getLen())

    def mod_time_ms(self, p: str) -> int:
        """Modification time of ``p`` in epoch milliseconds."""
        return int(self._fs.getFileStatus(self._path(p)).getModificationTime())

    def list_dirs(self, p: str) -> list[str]:
        """Names (not full URIs) of child directories of ``p``."""
        out = []
        for st in self._fs.listStatus(self._path(p)):
            if st.isDirectory():
                out.append(st.getPath().getName())
        return out

    def list_names(self, p: str) -> list[str]:
        """Names of ALL children (files and directories) of ``p``."""
        return [
            st.getPath().getName() for st in self._fs.listStatus(self._path(p))
        ]

    def create_exclusive(self, p: str, content: str = "") -> bool:
        """Create file ``p`` with ``content`` iff it does not already
        exist — the compare-and-set primitive for commit markers and
        writer leases. Returns False when the file already exists.

        ``FileSystem.create(path, overwrite=false)`` is atomic
        server-side on HDFS (namenode) and a conditional PUT on recent
        S3A; on the local (checksum) filesystem it is check-then-create
        with a sub-microsecond window — which is why callers that need
        mutual exclusion hold the writer lease AS WELL, rather than
        leaning on this alone. NOTE (verified empirically): directory
        ``rename`` is NOT fail-if-exists on the local Hadoop FS — it
        replaces an empty destination and moves INTO a non-empty one —
        so exclusive file creation is the only usable CAS here.

        STRICT failure semantics (round 10): False means exactly
        "the file already existed" — i.e. the CAS genuinely lost.
        Every other failure re-raises: a streaming ``stop()`` can
        interrupt the py4j call mid-flight AFTER the create succeeded
        server-side, and swallowing that into False made a commit
        whose marker had durably landed report "another writer won
        this version" (observed live in the kill-midrun test; the
        caller then aborted/retried a commit that already happened).
        An interrupted caller now sees the real exception, and the
        marker-aware abort keeps the committed version intact."""
        try:
            out = self._fs.create(self._path(p), False)
        except Exception as exc:  # noqa: BLE001 — py4j-wrapped
            if _is_already_exists(getattr(exc, "java_exception", None)):
                return False
            raise
        try:
            if content:
                out.write(bytearray(content.encode("utf-8")))
        finally:
            out.close()
        return True

    def read_utf8(self, p: str) -> str | None:
        """Contents of small text file ``p``; None if unreadable (a
        concurrent create may expose an existing-but-empty file —
        callers treat that conservatively)."""
        try:
            inp = self._fs.open(self._path(p))
        except Exception:  # noqa: BLE001 — missing / mid-create
            return None
        try:
            return str(
                self._jvm.org.apache.commons.io.IOUtils.toString(
                    inp, "UTF-8"
                )
            )
        except Exception:  # noqa: BLE001
            return None
        finally:
            inp.close()


def swap_partition_dirs(
    fs: HadoopFS, live_root: str, staged_root: str, partition_dirs: list[str]
) -> None:
    """Move freshly-written partition directories from a staged dataset
    into the live one, replacing any existing directory of the same
    name — the partition-scoped analog of the compaction whole-dataset
    swap, used by index upsert/merge writers so a rewrite never reads
    and overwrites the same path in one job (Spark's read/write-conflict
    staging semantics are version-sensitive; an explicit stage+rename
    is not).

    ``partition_dirs`` are directory names like ``pb=3``. Per
    directory: live → ``<name>__retired`` → delete, staged → live.
    Crash window: a crash between the two renames leaves a
    ``__retired`` sibling and no live dir — repaired on the next call
    by :func:`repair_partition_dirs` (invoked here first). The staged
    root is removed at the end.
    """
    repair_partition_dirs(fs, live_root)
    for name in partition_dirs:
        live = f"{live_root}/{name}"
        staged = f"{staged_root}/{name}"
        retired = f"{live_root}/{name}__retired"
        if not fs.exists(staged):
            # partition present in the plan but produced no rows (e.g.
            # every doc of a bucket was deleted): retire the live dir
            fs.delete(retired)
            if fs.exists(live):
                fs.rename(live, retired)
                fs.delete(retired)
            continue
        fs.delete(retired)
        if fs.exists(live):
            fs.rename(live, retired)
        fs.rename(staged, live)
        fs.delete(retired)
    fs.delete(staged_root)


def repair_partition_dirs(fs: HadoopFS, live_root: str) -> None:
    """Roll back debris from a crashed :func:`swap_partition_dirs`: a
    ``<name>__retired`` dir with no live ``<name>`` sibling means the
    crash hit between the two renames — restore the old data; with a
    live sibling it is post-swap debris — drop it."""
    if not fs.exists(live_root):
        return
    for name in fs.list_dirs(live_root):
        if not name.endswith("__retired"):
            continue
        live = f"{live_root}/{name[: -len('__retired')]}"
        retired = f"{live_root}/{name}"
        if fs.exists(live):
            fs.delete(retired)
        else:
            fs.rename(retired, live)
