from invoicenet_spark.fixtures.pages import (
    VOCAB_SIZE,
    gen_pages_pandas,
    gen_pages_spark,
    gen_queries,
    make_vocab,
)

__all__ = [
    "VOCAB_SIZE",
    "gen_pages_pandas",
    "gen_pages_spark",
    "gen_queries",
    "make_vocab",
]
