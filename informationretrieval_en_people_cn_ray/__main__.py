"""``python -m informationretrieval_en_people_cn_ray`` — job entry.

Mirrors the reference's two CLI modes (``SearchEngine.py:298-313``,
``IRWS_Argument_Parsing.py:6-13``):

- ``Index:comments.csv`` build mode →
    python -m informationretrieval_en_people_cn_ray index CORPUS OUT_DIR
- query-file mode (one query per line, top-k printed per query) →
    python -m informationretrieval_en_people_cn_ray search INDEX_DIR \
        [--query Q | --query-file F] [--k K] [--scorer bm25|dirichlet] \
        [--hydrate CORPUS --columns repo,path]

plus the index-maintenance lifecycle the reference lacks:

- ``extend INDEX DELTA_CORPUS DELTA_DIR OUT_DIR`` — tokenize only the
  new documents, merge generations byte-level
- ``delete INDEX id1,id2,...`` — tombstone documents (filtered from all
  queries immediately)
- ``compact INDEX [INDEX...] OUT_DIR`` — merge generations / physically
  drop tombstoned docs

and the data-processing surface:

- ``pipeline NAME TABLE_DIR [--out F.parquet]`` — run any named
  datapipe/relational pipeline (``pipeline --list`` prints all names)

This is the one module that owns a Ray session when run standalone
(``ray job submit``-compatible); it never re-inits an existing session,
so it also runs inside a driver-initialised cluster.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ensure_ray(cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs = dict(include_dashboard=False, logging_level="ERROR")
        if cpus:
            kwargs["num_cpus"] = cpus
        ray.init(address="local", **kwargs)


def _cmd_index(args: argparse.Namespace) -> int:
    from .pipelines.build import BuildConfig, build_index

    _ensure_ray(args.num_cpus)
    cfg = BuildConfig(
        num_segments=args.segments,
        docstat_partitions=args.docstat_partitions,
        stem=not args.no_stem,
        salt=args.salt,
        content_column=args.content_column,
        doc_id_column=args.doc_id_column,
    )
    manifest = build_index(args.corpus, args.out_dir, cfg)
    print(
        json.dumps(
            {
                k: manifest[k]
                for k in (
                    "num_docs",
                    "total_tokens",
                    "n_terms",
                    "postings_bytes",
                    "wall_s",
                )
            }
        )
    )
    return 0


def _cmd_append(args: argparse.Namespace) -> int:
    from .pipelines.merge import extend_generation, maybe_compact

    _ensure_ray(args.num_cpus)
    gens = extend_generation(
        args.index_dirs.split(","), args.delta_corpus, args.delta_dir
    )
    compacted = False
    if args.compact_at and len(gens) >= args.compact_at:
        if not args.compact_out:
            print("--compact-at needs --compact-out", file=sys.stderr)
            return 2
        gens, compacted = maybe_compact(
            gens, args.compact_out, max_generations=args.compact_at
        )
    print(json.dumps({"generations": gens, "compacted": compacted}))
    return 0


def _cmd_check(args: argparse.Namespace) -> int:
    from .pipelines.fsck import check_generations, check_index

    _ensure_ray(args.num_cpus)
    if "," in args.index_dir:
        # comma-separated paths = unmerged generation list (adds the
        # cross-generation disjointness/config checks)
        report = check_generations(args.index_dir.split(","), deep=args.deep)
    else:
        report = check_index(args.index_dir, deep=args.deep)
    print(json.dumps(report))
    return 0 if report["ok"] else 1


def _cmd_suggest(args: argparse.Namespace) -> int:
    from .pipelines.search import SearchEngine

    _ensure_ray(args.num_cpus)
    index_dir = (
        args.index_dir.split(",") if "," in args.index_dir else args.index_dir
    )
    eng = SearchEngine(index_dir, mode="local")
    rows = eng.suggest(args.word, k=args.k, max_dist=args.max_dist)
    print(
        json.dumps(
            {
                "word": args.word,
                "suggestions": [
                    {"term": t, "dist": d, "df": f} for t, d, f in rows
                ],
            }
        )
    )
    return 0


def _cmd_search(args: argparse.Namespace) -> int:
    import numpy as np

    from .pipelines.search import SearchEngine, search_many
    from .sources.corpus_source import DocStore

    _ensure_ray(args.num_cpus)
    # comma-separated paths = unmerged generation list (GenerationalSegments)
    index_dir = (
        args.index_dir.split(",") if "," in args.index_dir else args.index_dir
    )
    if args.near:
        parts = args.near.split(",")
        if len(parts) != 3 or not parts[2].strip().isdigit():
            print(
                "--near expects termA,termB,k (k a non-negative integer)",
                file=sys.stderr,
            )
            return 2
        a, b, k = parts
        eng = SearchEngine(index_dir, mode="local")
        ids, dists = eng.proximity(
            a, b, within=int(k), ordered=args.ordered
        )
        print(
            json.dumps(
                {
                    "query": f"{a} {'ONEAR' if args.ordered else 'NEAR'}/{k} {b}",
                    "doc_ids": [int(d) for d in ids],
                    "min_dists": [int(d) for d in dists],
                }
            )
        )
        return 0
    if args.query:
        queries = [args.query]
    elif args.query_file:
        with open(args.query_file) as f:
            queries = [q.strip() for q in f if q.strip()]
    else:
        print("need --query or --query-file", file=sys.stderr)
        return 2
    store = None
    if args.hydrate:
        # an index built over an explicit id column needs id→layout
        # translation in the store (layout hydration would read wrong rows)
        from .state.manifest import load_json

        first_dir = index_dir[0] if isinstance(index_dir, list) else index_dir
        coll = load_json(os.path.join(first_dir, "collection.json")) or {}
        idc = (coll.get("config") or {}).get("doc_id_column")
        store = DocStore(args.hydrate, doc_id_column=idc)
    hydrate_cols = args.columns.split(",") if args.columns else None

    if len(queries) > 1:
        # batch path: Dataset of queries over the actor pool
        tbl = search_many(
            index_dir,
            queries,
            k=args.k,
            scorer=args.scorer,
            concurrency=args.concurrency,
            prune=not args.no_prune,
        ).to_pandas()
        for q in queries:
            rows = tbl[tbl["query"] == q].sort_values("rank")
            _print_result(
                q,
                rows["doc_id"].tolist(),
                rows["score"].tolist(),
                store,
                hydrate_cols,
            )
        return 0

    eng = SearchEngine(index_dir, mode="local")
    res = eng.search(
        queries[0], k=args.k, scorer=args.scorer, prune=not args.no_prune
    )
    if isinstance(res, tuple):
        ids, scores = res
    else:
        ids, scores = res, np.full(len(res), np.nan)
    _print_result(queries[0], ids, scores, store, hydrate_cols)
    return 0


def _print_result(query, doc_ids, scores, store, hydrate_cols) -> None:
    """One JSON line per query — machine-consumable like bench.py."""
    out = {
        "query": query,
        "doc_ids": [int(d) for d in doc_ids],
        "scores": [None if s != s else round(float(s), 4) for s in scores],
    }
    if store is not None and len(out["doc_ids"]):
        t = store.lookup(out["doc_ids"], columns=hydrate_cols)
        by_id = {
            int(r["doc_id"]): {k: r[k] for k in t.column_names if k != "doc_id"}
            for r in t.to_pylist()
        }
        out["docs"] = [by_id.get(d) for d in out["doc_ids"]]
    print(json.dumps(out))


def _cmd_extend(args: argparse.Namespace) -> int:
    from .pipelines.merge import extend_index

    _ensure_ray(args.num_cpus)
    manifest = extend_index(
        args.index_dir, args.delta_corpus, args.delta_dir, args.out_dir
    )
    print(
        json.dumps(
            {k: manifest[k] for k in ("num_docs", "total_tokens", "wall_s")}
        )
    )
    return 0


def _cmd_compact(args: argparse.Namespace) -> int:
    """Merge N generations into one index; with tombstones on any input
    this physically drops the deleted documents."""
    from .pipelines.merge import merge_indexes

    _ensure_ray(args.num_cpus)
    manifest = merge_indexes(args.index_dirs, args.out_dir)
    print(
        json.dumps(
            {k: manifest[k] for k in ("num_docs", "total_tokens", "wall_s")}
        )
    )
    return 0


def _cmd_delete(args: argparse.Namespace) -> int:
    from .state.tombstones import delete_docs

    ids = [int(x) for x in args.doc_ids.split(",") if x.strip()]
    total = delete_docs(args.index_dir, ids)
    print(json.dumps({"tombstones": total}))
    return 0


def _pipeline_registry():
    """{name: callable(table_dir)} — every public zero-extra-arg pipeline
    in datapipe/relational (the library's data-processing surface,
    distinct from the index lifecycle commands)."""
    import inspect

    from .pipelines import datapipe as dp
    from .pipelines import relational as rel

    out = {}
    for mod in (dp, rel):
        for name, fn in vars(mod).items():
            if name.startswith("_") or not inspect.isfunction(fn):
                continue
            if getattr(fn, "__module__", "") != mod.__name__:
                continue
            params = list(inspect.signature(fn).parameters.values())
            if not params or params[0].name != "sf_dir":
                continue
            if any(
                q.default is inspect.Parameter.empty for q in params[1:]
            ):
                continue
            out[name] = fn
    return out


def _cmd_pipeline(args: argparse.Namespace) -> int:
    reg = _pipeline_registry()
    if args.list or not args.name:
        for name in sorted(reg):
            print(name)
        return 0
    if args.name not in reg:
        print(f"unknown pipeline {args.name!r}; --list shows names",
              file=sys.stderr)
        return 2
    if not args.table_dir:
        print("table_dir is required", file=sys.stderr)
        return 2
    _ensure_ray(args.num_cpus)
    from .pipelines.datapipe import _to_table

    res = reg[args.name](args.table_dir)
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    if isinstance(res, pa.Table):
        t = res
    elif isinstance(res, pd.DataFrame):
        t = pa.Table.from_pandas(res, preserve_index=False)
    elif isinstance(res, ray.data.Dataset):
        t = _to_table(res)
    else:
        print(
            f"pipeline {args.name!r} returned non-tabular "
            f"{type(res).__name__}; it is a library helper, not a CLI "
            "pipeline",
            file=sys.stderr,
        )
        return 2
    if args.out:
        pq.write_table(t, args.out)
        print(json.dumps({"rows": t.num_rows, "out": args.out}))
    else:
        print(json.dumps({"rows": t.num_rows,
                          "columns": t.column_names}))
        for row in t.slice(0, args.head).to_pylist():
            print(json.dumps(row, default=str))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="informationretrieval_en_people_cn_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("index", help="build an index from a parquet corpus")
    pi.add_argument("corpus")
    pi.add_argument("out_dir")
    pi.add_argument("--segments", type=int, default=16)
    pi.add_argument("--docstat-partitions", type=int, default=4)
    pi.add_argument("--no-stem", action="store_true")
    pi.add_argument("--salt", type=int, default=0)
    pi.add_argument("--content-column", default="content")
    pi.add_argument("--doc-id-column", default=None)
    pi.set_defaults(fn=_cmd_index)

    ps = sub.add_parser(
        "search",
        help="query a built index (or comma-separated generation list)",
    )
    ps.add_argument("index_dir")
    ps.add_argument(
        "--query",
        help=(
            "query text: keyword | 'phrase' | pre* | s*a* | /regex/ | "
            "ReplyTo:<id> | AND/OR/NOT combinations"
        ),
    )
    ps.add_argument("--query-file")
    ps.add_argument("--k", type=int, default=10)
    ps.add_argument("--scorer", choices=("bm25", "dirichlet"), default="bm25")
    ps.add_argument("--no-prune", action="store_true")
    ps.add_argument("--concurrency", type=int, default=2)
    ps.add_argument(
        "--near", help="proximity query: termA,termB,k (NEAR/k search)"
    )
    ps.add_argument(
        "--ordered",
        action="store_true",
        help="with --near: only termB AFTER termA counts (ONEAR/k)",
    )
    ps.add_argument("--hydrate", help="corpus path for doc hydration")
    ps.add_argument("--columns", help="comma-separated hydration columns")
    ps.set_defaults(fn=_cmd_search)

    pe = sub.add_parser(
        "extend", help="add new documents to an index (delta generation)"
    )
    pe.add_argument("index_dir")
    pe.add_argument("delta_corpus")
    pe.add_argument("delta_dir")
    pe.add_argument("out_dir")
    pe.set_defaults(fn=_cmd_extend)

    pc = sub.add_parser(
        "compact",
        help="merge generations into one index (applies tombstones)",
    )
    pc.add_argument("index_dirs", nargs="+")
    pc.add_argument("out_dir")
    pc.set_defaults(fn=_cmd_compact)

    pd = sub.add_parser("delete", help="tombstone documents by id")
    pd.add_argument("index_dir")
    pd.add_argument("doc_ids", help="comma-separated doc ids")
    pd.set_defaults(fn=_cmd_delete)

    pa_ = sub.add_parser(
        "append",
        help="append a delta generation WITHOUT merging (tiered pattern)",
    )
    pa_.add_argument(
        "index_dirs", help="current generation list (comma-separated)"
    )
    pa_.add_argument("delta_corpus")
    pa_.add_argument("delta_dir")
    pa_.add_argument(
        "--compact-at",
        type=int,
        default=0,
        help="compact into --compact-out when the list reaches N",
    )
    pa_.add_argument("--compact-out")
    pa_.set_defaults(fn=_cmd_append)

    pk = sub.add_parser("check", help="index integrity check (fsck)")
    pk.add_argument("index_dir")
    pk.add_argument(
        "--deep", action="store_true", help="decode every posting blob"
    )
    pk.set_defaults(fn=_cmd_check)

    pg = sub.add_parser(
        "suggest", help="spell suggestions from the index dictionary"
    )
    pg.add_argument("index_dir", help="index dir (or comma-separated generations)")
    pg.add_argument("word")
    pg.add_argument("--k", type=int, default=10)
    pg.add_argument("--max-dist", type=int, default=2)
    pg.set_defaults(fn=_cmd_suggest)

    pr = sub.add_parser(
        "pipeline",
        help=(
            "run a named datapipe/relational pipeline over a table "
            "directory (e.g. lang_id, exact_dedup_keepers, pagerank, "
            "pricing_summary); --list shows every name"
        ),
    )
    pr.add_argument("name", nargs="?", help="pipeline function name")
    pr.add_argument("table_dir", nargs="?",
                    help="directory of the input parquet tables")
    pr.add_argument("--out", help="write result parquet here instead of "
                    "printing the head")
    pr.add_argument("--head", type=int, default=20)
    pr.add_argument("--list", action="store_true",
                    help="list available pipeline names")
    pr.add_argument("--num-cpus", type=int)
    pr.set_defaults(fn=_cmd_pipeline)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
