from .hashing import hash64, hash64_expr_sql
from .normalize import comma_decimal, full_name, max_ts_lit, trim_all_strings
from .text import (
    bpe_ish_token_count,
    bpe_ish_tokens,
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
    ws_tokens,
)
from .vectors import cosine_similarity, dot_product, l2_norm

__all__ = [
    "hash64",
    "hash64_expr_sql",
    "comma_decimal",
    "full_name",
    "max_ts_lit",
    "trim_all_strings",
    "ws_tokens",
    "token_count",
    "bpe_ish_token_count",
    "bpe_ish_tokens",
    "lang_id",
    "quality_score",
    "doc_fingerprint",
    "dot_product",
    "l2_norm",
    "cosine_similarity",
]
