"""PySpark-native lineage-store analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference L-Store implementation
at /root/reference/ (mreza822/Lineage-Store-Database-Management-System;
L-Store: Sadoghi et al., arXiv:1601.04084). See SURVEY.md for the
operator-by-operator mapping.
"""

from .catalog import Database, int_schema
from .lineage import ConcurrentWriteError, LineageTable, Manifest
from .query import Index, Query, Record
from .session import get_spark
from .transaction import Transaction, TransactionWorker

__all__ = [
    "ConcurrentWriteError",
    "Database",
    "Index",
    "LineageTable",
    "Manifest",
    "Query",
    "Record",
    "Transaction",
    "TransactionWorker",
    "get_spark",
    "int_schema",
]
