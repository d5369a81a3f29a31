"""spark-submit entry point (north rule: ``spark-submit --py-files`` at N
and 4N executors). Absolute imports throughout — spark-submit executes this
file as a top-level script with the package shipped via --py-files.

Usage (local or cluster — master comes from spark-submit):

    zip -r kg.zip ai_knowledge_graph_builder_spark
    spark-submit --master <url> --py-files kg.zip \
        ai_knowledge_graph_builder_spark/__main__.py \
        --pages <pages parquet dir> --registry <registry parquet dir> \
        --output <stage-table base dir> [--with-chunks]
        [--with-canonicalization] [--gazetteer-from-registry]
        [--verify-integrity]

    # no --pages: synthesize the seeded demo corpus and run on it
    python -m ai_knowledge_graph_builder_spark --output /tmp/kg-out --demo

Every stage is a committed table under --output (plans/checkpoint.py); a
re-run with the same inputs resumes from the last committed snapshot.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _stat_fingerprint(*paths: str) -> str:
    """Fingerprint of local/posix input dirs from file stats (relpath, size,
    mtime) — cheap, content-sensitive enough for resume gating. Non-local
    URIs (s3:// etc.) fall back to the URI string; pass --fingerprint
    explicitly there (e.g. the Iceberg snapshot id)."""
    import hashlib
    from pathlib import Path

    h = hashlib.md5()
    for p in paths:
        root = Path(p)
        if not root.exists():
            h.update(p.encode())
            continue
        files = sorted(root.rglob("*")) if root.is_dir() else [root]
        for f in files:
            if f.is_file():
                st = f.stat()
                h.update(f"{f.relative_to(root)}:{st.st_size}:{st.st_mtime_ns}\n".encode())
    return h.hexdigest()


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="ai_knowledge_graph_builder_spark")
    ap.add_argument("--pages", help="pages parquet dir (url, warc_ts, html, text, lang)")
    ap.add_argument("--registry", help="registry parquet dir (REGISTRY schema)")
    ap.add_argument("--output", required=True, help="base dir for committed stage tables")
    ap.add_argument("--fingerprint", default=None,
                    help="input fingerprint for resume gating (default: a hash "
                         "of the input files' names/sizes/mtimes — NOT the bare "
                         "path, so replacing the data behind the same path "
                         "invalidates old snapshots)")
    ap.add_argument("--demo", action="store_true",
                    help="synthesize the seeded demo corpus (no --pages/--registry needed)")
    ap.add_argument("--demo-waves", type=int, default=5)
    ap.add_argument("--with-chunks", action="store_true")
    ap.add_argument("--with-canonicalization", action="store_true")
    ap.add_argument("--gazetteer-from-registry", action="store_true",
                    help="use registry aliases as the NER gazetteer (lowercase corpora)")
    ap.add_argument("--verify-integrity", action="store_true")
    args = ap.parse_args(argv)

    from ai_knowledge_graph_builder_spark.plans.pipeline import run_kg_pipeline_checkpointed
    from ai_knowledge_graph_builder_spark.session import get_spark

    spark = get_spark("kg-pipeline")
    spark.sparkContext.setLogLevel("WARN")

    doc_meta = employees = assignments = policies = emails = None
    gazetteer = None
    if args.demo:
        from ai_knowledge_graph_builder_spark.sources.corpus import generate_corpus

        c = generate_corpus(seed=42, waves=args.demo_waves)
        pages = spark.createDataFrame(c["pages"])
        registry = spark.createDataFrame(c["registry"])
        doc_meta = spark.createDataFrame(c["doc_meta"])
        employees = spark.createDataFrame(c["employees"])
        assignments = spark.createDataFrame(c["assignments"])
        policies = spark.createDataFrame(c["policies"])
        emails = spark.createDataFrame(c["emails"])
        fingerprint = args.fingerprint or f"demo-waves-{args.demo_waves}"
    else:
        if not args.pages or not args.registry:
            ap.error("--pages and --registry required unless --demo")
        pages = spark.read.parquet(args.pages)
        registry = spark.read.parquet(args.registry)
        fingerprint = args.fingerprint or _stat_fingerprint(args.pages, args.registry)

    if args.gazetteer_from_registry:
        from ai_knowledge_graph_builder_spark.operators.linking import build_alias_table

        rows = build_alias_table(registry).collect()
        gazetteer = [(r["alias"], "ORG") for r in rows]

    t0 = time.perf_counter()
    out, resumed = run_kg_pipeline_checkpointed(
        spark, args.output, pages, registry, fingerprint,
        doc_meta=doc_meta, employees=employees, assignments=assignments,
        policies=policies, emails=emails, gazetteer=gazetteer,
        with_chunks=args.with_chunks,
        with_canonicalization=args.with_canonicalization,
        verify_integrity=args.verify_integrity,
    )
    stats = {
        "elapsed_sec": round(time.perf_counter() - t0, 1),
        "resumed_stages": [k for k, v in resumed.items() if v],
        "built_stages": [k for k, v in resumed.items() if not v],
        "tables": {k: out[k].count() for k in ("documents", "mentions", "nodes", "edges", "triples")},
        "output": args.output,
    }
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
