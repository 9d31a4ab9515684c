"""Command-line interface — the reference binary's entry points
(``lib-lopez/src/cli.rs:11-88``, dispatch ``lib.rs:187-229``) mapped
onto the Spark engine:

    python -m lopez_spark validate <file.lcd>
    python -m lopez_spark run <file.lcd> <wave_name> [--store DIR]
        [--corpus N|PARQUET_DIR] [--batch-size N] [--partitions N]
        [--max-waves N] [--bloom CAPACITY] [--warc DIR]
        [--adaptive-politeness] [--trap-budget N]
    python -m lopez_spark test <file.lcd> <url> [--corpus N]
    python -m lopez_spark page-rank <wave_name> [--store DIR]
    python -m lopez_spark opic <wave_name> [--store DIR]
    python -m lopez_spark rm <wave_name> [--store DIR]

The crawl targets the deterministic synthetic web (``--corpus N``) or a
real image+caption corpus parquet directory (fetch is then a corpus
lookup; live HTTP is the documented ``HttpWeb`` integration point).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _engine(args, spark, directives):
    from .analyses import Analyzer
    from .catalog import WaveStore
    from .crawler.wave import CrawlEngine
    from .crawler.web import SyntheticWeb
    from .directives.parser import to_crawl_config

    overrides = {}
    if args.batch_size:
        overrides["batch_size"] = args.batch_size
    if args.partitions:
        overrides["partitions"] = args.partitions
    if args.bloom:
        overrides["seen_bloom_capacity"] = args.bloom
    if args.seen_tier != "auto":
        overrides["seen_tier"] = args.seen_tier
    if args.warc:
        overrides["warc_dir"] = args.warc
    if args.trap_budget:
        overrides["trap_budget"] = args.trap_budget
    if getattr(args, "adaptive_politeness", False):
        overrides["adaptive_politeness"] = True
    cfg = to_crawl_config(directives, **overrides)

    n = int(args.corpus)
    web = SyntheticWeb(n, with_body=cfg.warc_dir is not None)
    analyzer = Analyzer(directives) if directives.rule_sets else None
    images = None
    if analyzer is not None:
        from . import fixtures as fx

        images = spark.createDataFrame(fx.images_pandas(min(n, 10_000)))
    store = _mk_store(args)
    return CrawlEngine(spark, cfg, web, store, analyzer=analyzer, images=images), cfg


def _mk_store(args):
    """WaveStore from CLI args; --store-mode exists only on `run` —
    read-only subcommands default to snapshot semantics (load_frontier
    auto-detects delta/upsert layouts on disk regardless)."""
    from .catalog import WaveStore

    return WaveStore(
        args.store, args.wave_name, mode=getattr(args, "store_mode", "snapshot")
    )


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="lopez_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pv = sub.add_parser("validate")
    pv.add_argument("lcd")

    pr = sub.add_parser("run")
    pr.add_argument("lcd")
    pr.add_argument("wave_name")
    pr.add_argument("--store", default="./waves")
    pr.add_argument("--corpus", default="1000")
    pr.add_argument("--batch-size", type=int, default=None)
    pr.add_argument("--partitions", type=int, default=None)
    pr.add_argument("--max-waves", type=int, default=None)
    pr.add_argument("--bloom", type=int, default=None)
    pr.add_argument(
        "--store-mode",
        choices=["snapshot", "delta", "upsert"],
        default="snapshot",
        help="wave store write mode (upsert = store-side MERGE of deltas)",
    )
    pr.add_argument(
        "--seen-tier",
        choices=["auto", "broadcast", "banded", "cuckoo", "exact"],
        default="auto",
        help="seen-set tier (auto = select by filter size)",
    )
    pr.add_argument(
        "--warc",
        default=None,
        help="export fetched pages as .warc.gz archives into this dir "
        "(one per fetch task, gzip member per record; executors write "
        "here directly — use a shared mount on a multi-node cluster)",
    )
    pr.add_argument(
        "--adaptive-politeness",
        action="store_true",
        help="AIMD per-origin backoff: origins with network errors get "
        "their politeness delay multiplied (×2 up to ×8), clean waves "
        "recover it additively; max_hits_per_sec stays the ceiling; "
        "state rides in manifests (resume-correct)",
    )
    pr.add_argument(
        "--trap-budget",
        type=int,
        default=None,
        help="distinct-URL budget per (host, digit-normalized URL "
        "template) before the template stops contributing new frontier "
        "rows (spider-trap containment; see crawler/traps.py)",
    )
    pr.add_argument("--master", default=None)

    pt = sub.add_parser("test")
    pt.add_argument("lcd")
    pt.add_argument("url")
    pt.add_argument("--corpus", default="1000")

    pp = sub.add_parser("page-rank")
    pp.add_argument("wave_name")
    pp.add_argument("--store", default="./waves")
    pp.add_argument("--master", default=None)
    pp.add_argument("--top", type=int, default=20)

    po = sub.add_parser(
        "opic", help="OPIC importance over the crawled link graph "
        "(Abiteboul 2003 — the online crawl-ordering metric)"
    )
    po.add_argument("wave_name")
    po.add_argument("--store", default="./waves")
    po.add_argument("--master", default=None)
    po.add_argument("--top", type=int, default=20)

    pm = sub.add_parser("rm")
    pm.add_argument("wave_name")
    pm.add_argument("--store", default="./waves")

    pb = sub.add_parser(
        "rollback", help="drop every wave above TAG; the crawl resumes from TAG"
    )
    pb.add_argument("wave_name")
    pb.add_argument("tag", type=int)
    pb.add_argument("--store", default="./waves")

    ps = sub.add_parser(
        "status", help="per-wave counters, timings, and lineage from the manifests"
    )
    ps.add_argument("wave_name")
    ps.add_argument("--store", default="./waves")

    px = sub.add_parser(
        "export",
        help="write the named export views (status/linkage/analyses) to parquet",
    )
    px.add_argument("wave_name")
    px.add_argument("out_dir")
    px.add_argument("--store", default="./waves")
    px.add_argument("--master", default=None)

    pw = sub.add_parser(
        "export-wds",
        help="export an image+caption corpus (input_hint parquet / "
        "iceberg:<path>) as WebDataset tar shards for training loaders",
    )
    pw.add_argument("corpus")
    pw.add_argument("out_dir")
    pw.add_argument(
        "--shard-bytes",
        type=int,
        default=1 << 30,
        help="target shard size; shard count = ceil(corpus bytes / this)",
    )
    pw.add_argument("--master", default=None)

    pe = sub.add_parser(
        "expire",
        help="drop frontier state history older than the newest KEEP waves "
        "(linkage/analyses/manifests are kept for every wave)",
    )
    pe.add_argument("wave_name")
    pe.add_argument("--store", default="./waves")
    pe.add_argument("--keep", type=int, default=2)
    pe.add_argument("--master", default=None)

    args = p.parse_args(argv)

    if args.cmd == "validate":
        from .directives.parser import load_directives

        d = load_directives(args.lcd)
        print(f"ok: {len(d.seeds)} seeds, {len(d.boundaries)} boundaries, "
              f"{len(d.rule_sets)} rule sets")
        for name, ty in d.rules():
            print(f"  {name}: {ty}")
        return 0

    if args.cmd == "test":
        from .analyses import Analyzer
        from .crawler.dryrun import test_url
        from .crawler.web import SyntheticWeb
        from .directives.parser import load_directives, to_crawl_config

        d = load_directives(args.lcd)
        cfg = to_crawl_config(d)
        analyzer = Analyzer(d) if d.rule_sets else None
        rep = test_url(cfg, SyntheticWeb(int(args.corpus)), args.url, analyzer)
        print(
            json.dumps(
                {
                    "actual_url": rep.actual_url,
                    "report": rep.report_type,
                    "status_code": rep.status_code,
                    "links": rep.links,
                    "analyses": rep.analyses,
                },
                indent=2,
                default=str,
            )
        )
        return 0

    if args.cmd == "rm":
        from .catalog import WaveStore

        WaveStore(args.store, args.wave_name).remove()
        print(f"removed wave {args.wave_name!r}")
        return 0

    if args.cmd == "rollback":
        from .catalog import WaveStore

        store = _mk_store(args)
        store.rollback(args.tag)
        print(f"rolled back {args.wave_name!r} to wave {store.latest_wave()}")
        return 0

    if args.cmd == "status":
        from .catalog import WaveStore

        store = _mk_store(args)
        latest = store.latest_wave()
        if latest is None:
            print(f"no committed waves for {args.wave_name!r}")
            return 1
        print(f"{args.wave_name!r}: waves 0..{latest}")
        print("wave  batch  closed  error  new     links   dup    wall_s  tasks")
        for k in range(latest + 1):
            m = store.load_manifest(k)
            mm = m["metrics"]
            print(
                f"{k:4d}  {mm.get('n_batch', 0):5d}  {mm.get('n_closed', 0):6d}"
                f"  {mm.get('n_error', 0):5d}  {mm.get('n_new', 0):6d}"
                f"  {mm.get('n_links', 0):6d}  {mm.get('n_dup', 0):5d}"
                f"  {mm.get('wall_s', 0) or 0:6.1f}  {len(m.get('lineage', {})):5d}"
            )
        print(f"processed_total: {store.load_manifest(latest)['processed_total']}")
        return 0

    from .session import get_spark

    spark = get_spark("lopez-spark-cli", master=getattr(args, "master", None))
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if args.cmd == "run":
            from .directives.parser import load_directives

            d = load_directives(args.lcd)
            engine, cfg = _engine(args, spark, d)
            summary = engine.crawl(max_waves=args.max_waves)
            print(
                json.dumps(
                    {
                        "waves": summary.waves,
                        "processed": summary.processed,
                        "per_wave": [m["metrics"] for m in summary.per_wave],
                    }
                )
            )
            if cfg.enable_page_rank and summary.waves:
                top = engine.page_rank().orderBy("rank", ascending=False).limit(5)
                print("top ranks:")
                for r in top.collect():
                    print(f"  {r['rank']:.5f}  {r['url']}")
            return 0

        if args.cmd == "export":
            from .catalog import WaveStore
            from .crawler.config import Boundaries, CrawlConfig
            from .crawler.wave import CrawlEngine
            from .crawler.web import SyntheticWeb

            store = _mk_store(args)
            engine = CrawlEngine(
                spark,
                CrawlConfig(seeds=(), boundaries=Boundaries()),
                SyntheticWeb(1),
                store,
            )
            for name, df in engine.named_views().items():
                out = os.path.join(args.out_dir, name + ".parquet")
                df.write.mode("overwrite").parquet(out)
                print(f"wrote {name} -> {out}")
            return 0

        if args.cmd == "export-wds":
            from .sources.corpus import load_images
            from .sources.webdataset import export_corpus

            n = export_corpus(
                load_images(spark, args.corpus),
                args.out_dir,
                target_shard_bytes=args.shard_bytes,
            )
            print(f"wrote {n} shard(s) -> {args.out_dir}")
            return 0

        if args.cmd == "expire":
            from .catalog import WaveStore

            store = _mk_store(args)
            expired = store.expire_snapshots(spark, keep_last=args.keep)
            print(
                f"expired frontier state of waves {expired}; "
                f"latest = {store.latest_wave()}"
            )
            return 0

        if args.cmd in ("page-rank", "opic"):
            from .catalog import WaveStore
            from .crawler.config import Boundaries, CrawlConfig
            from .crawler.wave import CrawlEngine
            from .crawler.web import SyntheticWeb

            store = _mk_store(args)
            engine = CrawlEngine(
                spark,
                CrawlConfig(seeds=(), boundaries=Boundaries()),
                SyntheticWeb(1),
                store,
            )
            if args.cmd == "page-rank":
                ranks = engine.page_rank().orderBy(
                    "rank", ascending=False
                ).limit(args.top)
                for r in ranks.collect():
                    print(f"{r['rank']:.6f}  {r['url']}")
            else:
                ranks = engine.opic_rank().orderBy(
                    "importance", ascending=False
                ).limit(args.top)
                for r in ranks.collect():
                    print(f"{r['importance']:.6f}  {r['url']}")
            return 0
    finally:
        spark.stop()
    return 1


if __name__ == "__main__":
    sys.exit(main())
