"""CSV corpus ingest + one-time text normalization (SURVEY.md §2.1 S1,
§2.2 M8).

The reference's corpus arrives as hand-written CSV that needs fixing
before indexing: newline removal inside fields (``tools.replace_newlines``,
``tools.py:9-19``), Chinese→ASCII punctuation mapping
(``tools.replace_chinese_punctuation``, ``tools.py:22-39``), column
permutation into the standardized layout (``standardize_format.py:29-30``)
and field-count auditing (``tools.check_comment_parsing``,
``tools.py:51-62``).

Re-expressed Ray-Data-first: ``ray.data.read_csv`` → one vectorized
``map_batches`` normalization pass → ``write_parquet``, producing a corpus
directory the index build consumes directly. The normalizers are also
exported standalone for reuse in any text pipeline.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# fullwidth / CJK punctuation → ASCII (the semantic content of the
# reference's mapping table — ours is written from the Unicode fullwidth
# block, not copied)
CJK_PUNCT_MAP = {
    "，": ",", "。": ".", "！": "!", "？": "?", "：": ":", "；": ";",
    "（": "(", "）": ")", "【": "[", "】": "]", "“": '"', "”": '"',
    "‘": "'", "’": "'", "、": ",", "《": "<", "》": ">", "　": " ",
    "－": "-", "～": "~", "．": ".",
}
_TRANSLATE = str.maketrans(CJK_PUNCT_MAP)


def replace_newlines(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Newlines/CRs inside a field → spaces (vectorized)."""
    out = pc.replace_substring(col, pattern="\r\n", replacement=" ")
    out = pc.replace_substring(out, pattern="\n", replacement=" ")
    return pc.replace_substring(out, pattern="\r", replacement=" ")


def replace_cjk_punctuation(texts: list[str | None]) -> list[str | None]:
    """Fullwidth/CJK punctuation → ASCII (str.translate is C-speed).
    Null-safe: ``None`` passes through — ingest paths that keep
    partially-populated rows surface null text values here."""
    return [t.translate(_TRANSLATE) if isinstance(t, str) else t for t in texts]


def normalize_batch(
    batch: pa.Table, text_columns: list[str]
) -> pa.Table:
    for c in text_columns:
        arr = replace_newlines(batch[c])
        vals = replace_cjk_punctuation(arr.to_pylist())
        batch = batch.set_column(
            batch.column_names.index(c), c, pa.array(vals, pa.string())
        )
    return batch


def project_columns(
    batch: pa.Table,
    column_map: dict[str, str],
    min_valid: int | None = None,
) -> pa.Table:
    """Project/rename the mapped columns; with ``min_valid`` set, keep only
    rows having at least that many POPULATED mapped fields — null and, for
    string columns, ``""`` count as missing (CSV/JSON readers surface a
    missing trailing field as either). Kept rows may still carry missing
    fields; missing strings are normalized to ``""`` so downstream
    tokenize/sha stages see a uniform non-null schema. Shared by the CSV
    and JSONL ingests (one audit rule, not two drifting copies)."""
    cols = {}
    valid_count = None
    for src, dst in column_map.items():
        col = batch[src]
        valid = pc.is_valid(col)
        if pa.types.is_string(col.type):
            valid = pc.and_(valid, pc.not_equal(col, pa.scalar("")))
        v = pc.cast(pc.fill_null(valid, False), pa.int32())
        valid_count = v if valid_count is None else pc.add(valid_count, v)
        cols[dst] = col
    out = pa.table(cols)
    if min_valid is not None and valid_count is not None:
        out = out.filter(pc.greater_equal(valid_count, min_valid))
        for i, name in enumerate(out.column_names):
            if pa.types.is_string(out.column(i).type):
                out = out.set_column(
                    i, name, pc.fill_null(out.column(i), "")
                )
    return out


def ingest_csv_corpus(
    csv_path: str,
    out_dir: str,
    column_map: dict[str, str],
    text_columns: list[str] | None = None,
    min_fields: int | None = None,
) -> str:
    """CSV → normalized Parquet corpus.

    ``column_map``: {csv_column: corpus_column} — the standardize_format
    permutation as an explicit projection. ``min_fields`` audits rows the
    way ``check_comment_parsing`` does (the reference prints and skips
    short rows, ``IndexCreator.py:41-43``): rows with fewer than
    ``min_fields`` populated mapped columns are dropped; kept rows have
    missing strings normalized to ``""``."""
    ds = ray.data.read_csv(csv_path)

    ds = ds.map_batches(
        project_columns,
        fn_kwargs=dict(column_map=column_map, min_valid=min_fields),
        batch_format="pyarrow",
    )
    tcols = text_columns or [
        v for v in column_map.values() if v == "content"
    ]
    ds = ds.map_batches(
        normalize_batch,
        fn_kwargs=dict(text_columns=tcols),
        batch_format="pyarrow",
    )
    ds.write_parquet(out_dir)
    return out_dir
