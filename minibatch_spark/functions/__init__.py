"""Public scalar / expression function surface of the engine.

The reference has NO engine-level scalar functions — all computation
happens inside user emit fns (SURVEY.md §2.9) — so this package is the
capability layer the Spark engine adds. Everything here is a Column
expression builder (JVM-side, whole-stage-codegen eligible); nothing
row-at-a-time.

Grouped by origin:
- numeric determinism: ``dmoney/drate/dsum`` (exact decimal money math,
  engine-independent) and the limb-sum fast path
  ``unscaled/limb_sums/limb_total/with_disc_price_unscaled`` (exact
  decimal totals computed as whole-stage-codegen long sums —
  operators/relational.py)
- hashing: ``h64`` (md5-derived 60-bit, reproducible in any engine)
- text: ``tokens/shingles/minhash_sig/fast_minhash_sig/shingle_hashes``
  (operators/dedup.py), plus the text-statistics builders in
  operators/text.py
- vectors: ``as_double/dot/l2norm/cosine`` higher-order-function vector
  algebra and the quantized-LSH ``sign_matrix/signature_udf``
  (operators/similarity.py)
- curation: ``redact_pii`` (operators/text.py)
- layout: ``zorder_value`` Morton interleave (catalog.py)
"""

from minibatch_spark.operators.dedup import (  # noqa: F401
    fast_minhash_sig,
    h64,
    minhash_sig,
    shingle_hashes,
    shingles,
    tokens,
)
from minibatch_spark.operators.relational import (  # noqa: F401
    dmoney,
    drate,
    dsum,
    limb_sums,
    limb_total,
    unscaled,
    with_disc_price_unscaled,
)
from minibatch_spark.catalog import zorder_value  # noqa: F401
from minibatch_spark.operators.similarity import (  # noqa: F401
    as_double,
    cosine,
    dot,
    l2norm,
    sign_matrix,
    signature_udf,
)

__all__ = [
    "dmoney",
    "drate",
    "dsum",
    "unscaled",
    "limb_sums",
    "limb_total",
    "with_disc_price_unscaled",
    "h64",
    "tokens",
    "shingles",
    "minhash_sig",
    "fast_minhash_sig",
    "shingle_hashes",
    "as_double",
    "dot",
    "l2norm",
    "cosine",
    "sign_matrix",
    "signature_udf",
    "redact_pii",
    "zorder_value",
]

from minibatch_spark.operators.text import redact_pii  # noqa: F401,E402
