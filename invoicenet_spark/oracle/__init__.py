from invoicenet_spark.oracle.bm25_numpy import NumpyBM25Oracle

__all__ = ["NumpyBM25Oracle"]
