from gene_etl_spark.lake.merge import BUCKET_COL, MergeResult, merge_into
from gene_etl_spark.lake.table import LSN_COL, CommitConflict, LakeTable

__all__ = [
    "LakeTable",
    "CommitConflict",
    "LSN_COL",
    "BUCKET_COL",
    "MergeResult",
    "merge_into",
]
