from invoicenet_spark.query.exec import Index, load_index, search

__all__ = ["Index", "load_index", "search"]
