from gene_etl_spark.api.server import ApiServer

__all__ = ["ApiServer"]
