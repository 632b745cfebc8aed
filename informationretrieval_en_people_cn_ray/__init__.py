"""informationretrieval_en_people_cn_ray — a Ray-Data-native full-text engine.

A from-scratch, Ray-Data-first inverted-index build + BM25 top-k query
engine with the query and data-processing capabilities of the reference
comment search engine (Fabian-Sommer/InformationRetrieval-en.people.cn,
surveyed in SURVEY.md), re-expressed over ``ray.data.Dataset`` pipelines:

- zero-copy Arrow ``map_batches`` tokenization (lowercase + in-repo Porter
  stemming + length/frequency filtering, mirroring the reference's
  preprocessing at ``IndexCreator.py:49-52,112``),
- partial-combine + salted shuffle posting-list construction (replacing the
  reference's single-threaded k-way merge, ``IndexCreator.py:286-338``),
- delta+varint-compressed positional postings (replacing the reference's
  char-level Huffman coding, ``Huffman.py`` / ``IndexCreator.py:364-440``),
- sharded, manifest-checkpointed index segments (replacing the DAWG seek
  list, ``IndexCreator.py:340-341``), and
- a stateful segment-searcher actor pool serving the reference query
  grammar (keyword / phrase / prefix / phrase-prefix / boolean AND-OR-NOT /
  ranked top-k; ``QueryTree.py``, ``SearchEngine.py``).

Plus the large-scale training-data operators a 100 TB pipeline needs:
exact + MinHash-LSH + SimHash + n-gram-Jaccard dedup, embedding ANN,
language-ID, quality scoring, token counting and document fingerprinting.
"""

__version__ = "0.1.0"

# Host mitigation: this sandbox's THP fault path can degrade to MB/s
# (hostmem.py docstring); importing the library in any process — driver
# or Ray worker — turns THP off for that process. Opt out: IRPC_KEEP_THP=1.
from .hostmem import disable_thp as _disable_thp

THP_DISABLED = _disable_thp()


def _settle_fsspec_http() -> None:
    """Concurrent-plan import-race fix. Ray's ``read_parquet`` probes
    ``fsspec.implementations.http`` on EVERY read; in environments
    without ``aiohttp`` that module import raises and is removed from
    ``sys.modules``, so every dataset creation re-attempts it — and two
    plans created in concurrent threads can hit CPython's circular-
    import deadlock-avoidance path, where the second thread receives
    the half-initialized module and dies with ``ImportError: cannot
    import name 'HTTPFileSystem'`` instead of Ray's caught
    ``ModuleNotFoundError`` (reproduced by tests/test_concurrent_plans
    before this fix). Settle it ONCE at import: if the real module
    can't load, pin a sentinel module exposing an ``HTTPFileSystem``
    class no filesystem will ever be an instance of — Ray's
    ``isinstance`` probe then returns False, race-free."""
    try:
        import fsspec.implementations.http  # noqa: F401
    except ModuleNotFoundError:
        import sys
        import types

        if "fsspec" not in sys.modules:
            # fsspec itself is absent: stubbing the submodule would mask
            # a genuine missing dependency — leave the environment alone.
            try:
                import fsspec.implementations  # noqa: F401
            except Exception:
                return

        stub = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # sentinel: nothing instantiates it
            pass

        stub.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = stub
        # Keep attribute access consistent with sys.modules so
        # `import fsspec.implementations.http as m` and
        # `fsspec.implementations.http` both resolve to the stub.
        parent = sys.modules.get("fsspec.implementations")
        if parent is not None:
            parent.http = stub
    except Exception:
        pass  # any other import outcome: leave the environment alone


_settle_fsspec_http()
