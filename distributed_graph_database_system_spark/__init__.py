"""PySpark-native analytics engine with the capabilities of
Ramakrishna-C/Distributed_Graph_Database_System (see README.md / SURVEY.md).

Public API:
    from distributed_graph_database_system_spark import Engine, get_spark
"""

from distributed_graph_database_system_spark.api import Engine
from distributed_graph_database_system_spark.session import get_spark

__all__ = ["Engine", "get_spark"]
