"""Column-expression builders for text/dedup/similarity operators.

Everything here is a pure `pyspark.sql.functions` composition — JVM-side,
codegen'd, no Python UDFs — and each builder has an exactly-equivalent
ANSI/DuckDB SQL form (see plans/oracles.py) so results are oracle-checkable
bit-for-bit. Hashes use md5 (identical hex output in Spark and DuckDB);
numeric reductions keep a deterministic left-to-right order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column, lowercase: bool = True) -> Column:
    """Whitespace tokenization."""
    t = F.lower(text) if lowercase else text
    return F.split(t, r"\s+")


def bpe_ish_tokens(text: Column) -> Column:
    """BPE-ish regex tokenization: word pieces OR single non-space symbols
    (`\\w+` runs and punctuation as separate tokens)."""
    return F.regexp_extract_all(F.lower(text), F.lit(r"(\w+|[^\w\s])"), 1)


def token_shingles(toks: Column, k: int) -> Column:
    """k-token shingles: ['a','b','c','d'],k=3 → ['a b c','b c d'].
    Documents with fewer than k tokens yield an EMPTY array — the same
    empty-range semantics every DuckDB oracle's shingle macro has
    (range(1, len-k+2) is empty for len < k). The old whole-text
    fallback silently diverged engine from oracle on short docs.

    Built with `zip_with` over shifted slices rather than
    `transform(sequence, i -> get(toks, i+j))`: higher-order lambdas run
    interpreted (no codegen CSE), so a `get(toks, ·)` inside the lambda
    re-evaluates the token expression PER ELEMENT — ~k·n tokenizations per
    row. zip_with evaluates each array argument once per row (k refs
    total), which measured ~2.5x faster on the dedup operators at sf0.1.
    """
    n = F.size(toks)
    shingled = toks
    for j in range(1, k):
        # zip_with pads the shorter side with null; concat(null) → null
        # tail elements, trimmed by the final slice.
        shingled = F.zip_with(
            shingled,
            F.slice(toks, j + 1, n - j),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(n >= k, F.slice(shingled, 1, n - k + 1)).otherwise(
        F.array().cast("array<string>")
    )


def char_shingles(text: Column, k: int, stride: int = 1) -> Column:
    """k-char shingles with stride (rolling fingerprint input)."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(text) - k + 1, F.lit(1)), F.lit(stride))
    return F.transform(idx, lambda i: F.substring(text, i, k))


def minhash_signature(shingle_arr: Column, num_hashes: int) -> Column:
    """MinHash signature: element j = min over shingles of
    md5('<j>:'+shingle). String-min over hex digests — portable across
    engines, no murmur dependency."""
    return F.array(
        *[
            F.array_min(
                F.transform(shingle_arr, lambda s: F.md5(F.concat(F.lit(f"{j}:"), s)))
            )
            for j in range(num_hashes)
        ]
    )


def band_keys(signature: Column, bands: int, rows_per_band: int) -> Column:
    """LSH banding: band b = md5 of its concatenated signature rows."""
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    *[F.get(signature, b * rows_per_band + r) for r in range(rows_per_band)],
                )
            )
            for b in range(bands)
        ]
    )


def hex16_to_int(hex4: Column) -> Column:
    """First 4 hex chars → int in [0, 65536)."""
    return F.conv(hex4, 16, 10).cast("long")


def simhash16(toks: Column) -> Column:
    """16-bit SimHash over a token array.

    For each bit i: s_i = Σ_tokens (2*bit_i(md5(token)) − 1); signature
    bit i set iff s_i > 0. The 16 bit positions are Python-unrolled
    (fixed constants → flat codegen; the Python shiftleft/shiftright API
    only takes literal bit counts anyway).
    """
    tok_hashes = F.transform(toks, lambda t: hex16_to_int(F.substring(F.md5(t), 1, 4)))

    def make_vote(i: int):
        # closure factory: F.aggregate requires an exactly-2-arg merge fn
        def merge(acc, h):
            return acc + (F.shiftright(h, i).cast("int").bitwiseAND(F.lit(1)) * 2 - 1)
        return merge

    sig = F.lit(0).cast("long")
    for i in range(16):
        vote = F.aggregate(tok_hashes, F.lit(0), make_vote(i))
        sig = sig + F.when(vote > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def hamming16(a: Column, b: Column) -> Column:
    """Hamming distance between two 16-bit signatures."""
    x = a.bitwiseXOR(b)
    out = F.lit(0)
    for i in range(16):
        out = out + F.shiftright(x, i).cast("int").bitwiseAND(F.lit(1))
    return out


def dot_product(a: Column, b: Column) -> Column:
    """Deterministic left-to-right dot product over double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot/(|a|*|b|) with sequential sums — matches the explicit oracle
    formula (not an engine-specific fused kernel)."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def round4(c: Column) -> Column:
    """Engine-portable 4-decimal rounding: floor(x·10⁴)/10⁴.

    ROUND() on doubles is engine-DEPENDENT at .00005 boundaries (Spark
    rounds the shortest decimal repr via BigDecimal HALF_UP; DuckDB rounds
    the binary value), so two engines given bit-identical doubles can
    disagree by 1e-4. floor is exact on doubles: identical inputs →
    identical outputs, always. SQL twin: floor((x) * 10000) / 10000.
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.floor(c * 10000) / 10000

