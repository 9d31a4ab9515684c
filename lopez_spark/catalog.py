"""Wave store: checkpointed, resumable crawl state (operators S5/S6, O5).

The reference keeps all state in Postgres with idempotent upserts
("idempotent atomic operations are the key", ``lib-lopez/src/lib.rs:1``;
``ensure_*.sql``; wave upsert ``postgres-lopez/src/sql/ensure_wave.sql``).
Here a wave is a sequence of *snapshots*: each crawl wave commits

    <root>/<wave_name>/w<k>/frontier.parquet   (full frontier state)
    <root>/<wave_name>/w<k>/linkage.parquet    (edges discovered in wave k)
    <root>/<wave_name>/w<k>/manifest.json      (metrics + lineage; commit point)

The manifest is written *last* via atomic rename, so a crash mid-wave
resumes from the previous complete snapshot — the analogue of lopez's
``reset_queue.sql`` (taken→open on restart).  When an Iceberg runtime
jar is available the same API maps onto Iceberg snapshots + ``MERGE
INTO`` with metrics in snapshot summary metadata; the sandbox has no
Iceberg jar (SURVEY §7), so the parquet+manifest fallback keeps the
semantics honest: append-only snapshots, atomic commit, resume from any
checkpoint.  Reading a snapshot back also cuts DataFrame lineage (the
iterative-job checkpoint pattern).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

FRONTIER_COLS = ["url", "url_hash", "origin", "status", "http_status", "depth"]
LINKAGE_COLS = ["from_url", "from_hash", "reason", "to_url", "to_hash", "depth"]


class WaveStore:
    """mode='snapshot': every wave writes the full frontier (simple,
    read-optimal).  mode='delta': a wave writes only its *changed* rows
    (processed + newly discovered — O(batch + discoveries), the
    Iceberg/LSM write pattern) with a full compaction snapshot every
    ``compact_every`` waves; reads reconstruct latest-status-wins via
    max_by over (base snapshot ∪ deltas).  mode='upsert': the store
    itself performs the ``MERGE INTO``-equivalent keyed upsert — each
    wave's new state is derived *store-side* from the previous
    committed state with the wave's delta rows upserted by ``url_hash``
    (matched rows replaced, unmatched inserted), then written as a full
    read-optimal snapshot.  This is the copy-on-write physical shape of
    Iceberg ``MERGE INTO`` (and the reference's ``ensure_*``
    on-conflict suite, ``postgres-lopez/src/sql/``): the store, not the
    engine, is the merge authority, and re-running an uncommitted
    wave's merge is idempotent.  All modes produce identical frontiers
    (tested)."""

    def __init__(
        self,
        root: str,
        wave_name: str,
        mode: str = "snapshot",
        compact_every: int = 8,
    ):
        assert mode in ("snapshot", "delta", "upsert")
        self.root = root
        self.wave_name = wave_name
        self.mode = mode
        self.compact_every = compact_every
        self.dir = os.path.join(root, wave_name)
        os.makedirs(self.dir, exist_ok=True)

    def _wdir(self, k: int) -> str:
        return os.path.join(self.dir, f"w{k:05d}")

    def latest_wave(self) -> int | None:
        """Highest wave number with a committed manifest, or None."""
        best = None
        if not os.path.isdir(self.dir):
            return None
        for name in os.listdir(self.dir):
            if name.startswith("w") and os.path.exists(
                os.path.join(self.dir, name, "manifest.json")
            ):
                k = int(name[1:])
                best = k if best is None else max(best, k)
        return best

    def write_data(
        self,
        k: int,
        frontier: DataFrame,
        linkage: DataFrame | None,
        analyses: DataFrame | None = None,
        delta: DataFrame | None = None,
    ) -> None:
        """Write wave ``k``'s parquet (not yet committed).  In delta
        mode with a ``delta`` frame given, only the changed rows are
        written unless this wave is a compaction point."""
        wdir = self._wdir(k)
        if os.path.isdir(wdir):  # idempotent re-run of an uncommitted wave
            shutil.rmtree(wdir)
        if self.mode == "upsert" and delta is not None:
            # MERGE INTO target USING delta ON target.url_hash = delta.url_hash
            # WHEN MATCHED THEN UPDATE * WHEN NOT MATCHED THEN INSERT *
            # — expressed as anti-join ∪ delta over the previous
            # committed snapshot, written as wave k's full snapshot
            self._merge_upsert(k, delta).write.mode("overwrite").parquet(
                os.path.join(wdir, "frontier.parquet")
            )
        elif (
            self.mode == "snapshot"
            or delta is None
            or k % self.compact_every == 0
        ):
            frontier.select(*FRONTIER_COLS).write.mode("overwrite").parquet(
                os.path.join(wdir, "frontier.parquet")
            )
        else:
            delta.select(*FRONTIER_COLS).write.mode("overwrite").parquet(
                os.path.join(wdir, "delta.parquet")
            )
        if linkage is not None:
            linkage.select(*LINKAGE_COLS).write.mode("overwrite").parquet(
                os.path.join(wdir, "linkage.parquet")
            )
        if analyses is not None:
            analyses.write.mode("overwrite").parquet(
                os.path.join(wdir, "analyses.parquet")
            )

    def _merge_upsert(self, k: int, delta: DataFrame) -> DataFrame:
        """The keyed upsert: previous committed snapshot with ``delta``
        rows replacing matches on ``url_hash`` and inserting the rest.
        Delta keys are unique by construction (status updates and
        discoveries are disjoint), so anti-join ∪ delta ≡ MERGE.  At
        wave 0 (no previous state) the delta IS the state."""
        spark = delta.sparkSession
        prev = None
        for j in range(k - 1, -1, -1):
            if os.path.exists(os.path.join(self._wdir(j), "frontier.parquet")):
                prev = j
                break
        d = delta.select(*FRONTIER_COLS)
        if prev is None:
            return d
        prev_df = spark.read.parquet(
            os.path.join(self._wdir(prev), "frontier.parquet")
        )
        return (
            prev_df.join(d.select("url_hash"), "url_hash", "left_anti")
            .select(*FRONTIER_COLS)
            .unionByName(d)
        )

    def load_all_analyses(self, spark: SparkSession, upto: int | None = None) -> DataFrame:
        upto = self.latest_wave() if upto is None else upto
        paths = [
            os.path.join(self._wdir(k), "analyses.parquet")
            for k in range((upto or 0) + 1)
            if os.path.exists(os.path.join(self._wdir(k), "analyses.parquet"))
        ]
        return spark.read.parquet(*paths)

    def commit_manifest(self, k: int, manifest: dict) -> None:
        """Atomic commit point: manifest written last via rename."""
        wdir = self._wdir(k)
        tmp = os.path.join(wdir, ".manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)
        os.rename(tmp, os.path.join(wdir, "manifest.json"))

    def commit_wave(
        self,
        k: int,
        frontier: DataFrame,
        linkage: DataFrame | None,
        manifest: dict,
    ) -> None:
        """Atomically commit wave ``k``: parquet first, manifest last."""
        self.write_data(k, frontier, linkage)
        self.commit_manifest(k, manifest)

    def load_frontier(self, spark: SparkSession, k: int) -> DataFrame:
        """Frontier state as of wave ``k``: the latest full snapshot at
        or before ``k`` plus all later deltas, latest-status-wins."""
        snap = os.path.join(self._wdir(k), "frontier.parquet")
        if os.path.exists(snap):
            return spark.read.parquet(snap)
        base = None
        for j in range(k - 1, -1, -1):
            if os.path.exists(os.path.join(self._wdir(j), "frontier.parquet")):
                base = j
                break
        if base is None:
            raise FileNotFoundError(f"no frontier snapshot at or before wave {k}")
        from pyspark.sql import functions as F

        parts = [
            spark.read.parquet(os.path.join(self._wdir(base), "frontier.parquet"))
            .withColumn("__w", F.lit(base))
        ]
        for j in range(base + 1, k + 1):
            parts.append(
                spark.read.parquet(os.path.join(self._wdir(j), "delta.parquet"))
                .withColumn("__w", F.lit(j))
            )
        allrows = parts[0]
        for p in parts[1:]:
            allrows = allrows.unionByName(p)
        latest = allrows.groupBy("url_hash").agg(
            F.max_by(F.struct(*FRONTIER_COLS), F.col("__w")).alias("r")
        )
        return latest.select(*[F.col(f"r.{c}").alias(c) for c in FRONTIER_COLS])

    def load_manifest(self, k: int) -> dict:
        with open(os.path.join(self._wdir(k), "manifest.json")) as f:
            return json.load(f)

    def load_all_linkage(self, spark: SparkSession, upto: int | None = None) -> DataFrame:
        upto = self.latest_wave() if upto is None else upto
        paths = [
            os.path.join(self._wdir(k), "linkage.parquet")
            for k in range((upto or 0) + 1)
            if os.path.exists(os.path.join(self._wdir(k), "linkage.parquet"))
        ]
        return spark.read.parquet(*paths)

    def rollback(self, k: int) -> None:
        """Iceberg-style snapshot rollback: drop every wave above tag
        ``k`` — committed or not — so the crawl resumes from snapshot
        ``k`` exactly as if it had just been committed.  Safe in both
        modes: ``load_frontier(k)`` only ever reads wave dirs ≤ k (the
        latest full snapshot at-or-before k plus later deltas,
        latest-status-wins — the ``MERGE INTO``-equivalent keyed upsert
        the reference expresses as the ``ensure_*`` on-conflict suite,
        ``postgres-lopez/src/sql/``).  Rolling back to a delta-only tag
        is therefore as valid a resume point as a compaction snapshot.

        Tags whose frontier state history was reclaimed by
        :meth:`expire_snapshots` are refused — rolling back below the
        expiry horizon would leave a store whose state cannot be
        reconstructed."""
        resumable = False
        for j in range(k, -1, -1):
            wd = self._wdir(j)
            if os.path.exists(os.path.join(wd, "frontier.parquet")):
                resumable = True
                break
            if not os.path.exists(os.path.join(wd, "delta.parquet")):
                break  # neither snapshot nor delta: expired (or absent)
        if not resumable:
            raise ValueError(
                f"cannot roll back to wave {k}: its frontier state history "
                f"was expired (expire_snapshots) or never existed"
            )
        for name in os.listdir(self.dir):
            if name.startswith("w") and int(name[1:]) > k:
                shutil.rmtree(os.path.join(self.dir, name))

    def expire_snapshots(self, spark: SparkSession, keep_last: int = 2) -> list[int]:
        """Iceberg-style ``expire_snapshots``: drop frontier STATE
        history (frontier/delta parquet) for waves older than the newest
        ``keep_last`` committed waves.  Linkage, analyses, and manifests
        are append-only facts — data and lineage metrics — and are kept
        for every wave; only the superseded frontier state is
        reclaimable (in snapshot mode each wave re-writes the full
        frontier, so an N-wave crawl holds N copies until expiry).

        If the oldest kept wave has no full snapshot (delta mode), one
        is materialized there FIRST (write to a temp dir, atomic
        rename), so every kept wave remains a valid resume/rollback
        point before anything is deleted; a crash mid-expiry can only
        leave extra history, never a broken chain.  Returns the wave
        ids whose state was expired."""
        latest = self.latest_wave()
        if latest is None:
            return []
        k0 = max(0, latest - keep_last + 1)
        snap = os.path.join(self._wdir(k0), "frontier.parquet")
        if not os.path.exists(snap):
            tmp = snap + ".tmp"
            self.load_frontier(spark, k0).select(*FRONTIER_COLS).write.mode(
                "overwrite"
            ).parquet(tmp)
            os.rename(tmp, snap)
        expired = set()
        for j in range(0, k0):
            wd = self._wdir(j)
            for name in ("frontier.parquet", "delta.parquet"):
                p = os.path.join(wd, name)
                if os.path.exists(p):
                    shutil.rmtree(p)
                    expired.add(j)
        return sorted(expired)

    def remove(self) -> None:
        """``lopez rm`` — drop the wave (cascade delete,
        ``migrations/20191214201027_delete-waves``)."""
        if os.path.isdir(self.dir):
            shutil.rmtree(self.dir)
