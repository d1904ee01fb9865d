from medalforge_lakehouse_data_spark.format.metadata import (
    DataFile,
    Snapshot,
    TableMetadata,
)
from medalforge_lakehouse_data_spark.format.table import Table

__all__ = ["DataFile", "Snapshot", "TableMetadata", "Table"]
