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
