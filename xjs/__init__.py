"""xjs — a PySpark-native, compile-then-validate schema + constraint engine.

Built from scratch in the spirit of ``extended-jsonschema``'s design
(reference: /root/reference, v0.1.0): a JSON-Schema draft-04 dict is
compiled ONCE on the driver, and the compiled artifact — not per-row
keyword dispatch — does all the work:

* **static mode** (`xjs.plan`): the schema is reconciled against a
  DataFrame's StructType at compile time and every keyword becomes a
  Catalyst ``Column`` predicate (whole-stage-codegen'd, pushdown-able).
  This is the 100 TB path: zero Python in the row loop.
* **dynamic mode** (`xjs.dynamic`): the schema compiles to a tree of
  Python closures evaluated over parsed JSON values — used for exact
  keyword-parity with the reference (error multiplicity/paths/order)
  and, wrapped in an Arrow-batched pandas UDF, for heterogeneous
  JSON-string columns.
* **engine checks** (`xjs.checks`): single-pass column stats,
  skew-defused uniqueness, broadcast referential joins, histogram
  drift (PSI/KS), timestamp monotonicity — the constraint classes the
  reference's design generalizes to at table scale.
* **pipeline ops** (`xjs.pipeline`): dedup (exact / minhash-LSH /
  simhash / jaccard / exact-substring / embedding-cosine + survivor
  clustering), similarity search (brute / LSH / IVF / PQ-ADC), text
  quality / lang-id / repetition / token counting, deterministic +
  stratified + weighted sampling, decontamination, URL
  canonicalization, domain reputation, boilerplate n-gram detection,
  PII scan/redaction, as-of joins (plain + time-bucketed), heavy
  hitters (batch + streaming Misra-Gries), sequence packing,
  multimodal plumbing, LM perplexity gates (bigram/trigram + CCNet
  head/middle/tail buckets), bloom novelty prefilter, line/char-grain
  corpus dedup with incremental cross-run state — the operations a
  web-scale training-data pipeline needs.
* **sources** (`xjs.sources`): parquet/Iceberg-probe tables, JSONL
  crawls with corrupt-record quarantine, WARC/WET + raw response
  shards (gzip-member framing, batch and streaming) — the formats a
  crawl actually arrives in.

Reference parity citations use ``file:line`` into /root/reference.
"""

from xjs.errors import SchemaError, ValidationError
from xjs.frontend import compile_frontend, SchemaNode
from xjs.dynamic import build_evaluator

__version__ = "0.1.0"

__all__ = [
    "SchemaError",
    "ValidationError",
    "compile_frontend",
    "SchemaNode",
    "build_evaluator",
]
