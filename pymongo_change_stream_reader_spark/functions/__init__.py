"""Public scalar-function surface of the engine.

One import point for the column-level building blocks the operators
are made of — usable directly in any DataFrame expression:

    from pymongo_change_stream_reader_spark import functions as EF
    df.select(EF.fingerprint(F.col("text")), EF.token_count(F.col("text")))
"""

from pymongo_change_stream_reader_spark.operators.cdc import (
    document_key_json,
    envelope_value,
    op_code,
    topic,
)
from pymongo_change_stream_reader_spark.operators.bloom import (
    bloom_positions,
)
from pymongo_change_stream_reader_spark.operators.dedup import (
    jaccard,
    minhash_signature,
    positional_ngrams,
    simhash64,
    word_ngrams,
)
from pymongo_change_stream_reader_spark.operators.similarity import (
    cosine,
    dot,
    l2_norm,
    lsh_bucket,
)
from pymongo_change_stream_reader_spark.operators.text import (
    bpe_ish_token_count,
    fingerprint,
    mean_token_len,
    normalized_text,
    predicted_lang,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
)

__all__ = [
    "document_key_json", "envelope_value", "op_code", "topic",
    "jaccard", "minhash_signature", "positional_ngrams", "simhash64",
    "word_ngrams", "bloom_positions",
    "cosine", "dot", "l2_norm", "lsh_bucket",
    "bpe_ish_token_count", "fingerprint", "mean_token_len",
    "normalized_text", "predicted_lang", "punct_ratio", "quality_score",
    "stopword_ratio", "token_count", "tokens",
]
