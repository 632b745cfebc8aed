"""JSONL corpus ingest — the de-facto interchange format of LLM training
data (one JSON object per line, usually a ``text`` field plus metadata).

Counterpart to the CSV ingest (SURVEY.md §2.1 S1 / §2.2 M8, reference
``standardize_format.py`` + ``tools.py``) for the format the reference
never needed: ``ray.data.read_json`` → field projection/rename + null
audit + the shared text normalization pass (newline removal, CJK
punctuation mapping) → ``write_parquet``, producing a corpus directory
``pipelines.build.build_index`` and ``DocStore`` consume directly.
Streaming end to end: no driver-side materialization at any size.
"""

from __future__ import annotations

import ray.data

from .csv_ingest import normalize_batch, project_columns


def ingest_jsonl_corpus(
    jsonl_path: str,
    out_dir: str,
    column_map: dict[str, str] | None = None,
    text_columns: list[str] | None = None,
    drop_null: bool = True,
) -> str:
    """JSONL file/directory → normalized Parquet corpus.

    ``column_map``: {json_field: corpus_column} projection (default:
    ``{"text": "content"}``). Rows with ANY null/empty mapped field are
    audited out when ``drop_null`` (the CSV path's audit rule with
    ``min_fields = len(column_map)``; one shared implementation)."""
    column_map = column_map or {"text": "content"}
    ds = ray.data.read_json(jsonl_path)

    ds = ds.map_batches(
        project_columns,
        fn_kwargs=dict(
            column_map=column_map,
            min_valid=len(column_map) if drop_null else None,
        ),
        batch_format="pyarrow",
    )
    tcols = text_columns or [
        v for v in column_map.values() if v == "content"
    ]
    if tcols:
        ds = ds.map_batches(
            normalize_batch,
            fn_kwargs=dict(text_columns=tcols),
            batch_format="pyarrow",
        )
    ds.write_parquet(out_dir)
    return out_dir


def export_jsonl_corpus(corpus_dir: str, out_dir: str) -> str:
    """Parquet corpus → JSONL shards (the interchange direction OUT):
    one JSON object per row, one file per block via ``write_json`` —
    streaming, partitioned, no driver materialization. Round-trips
    through ``ingest_jsonl_corpus`` (gated by test)."""
    ray.data.read_parquet(corpus_dir).write_json(out_dir)
    return out_dir
