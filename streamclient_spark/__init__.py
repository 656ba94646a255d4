"""streamclient_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark re-expression of the query and
data-processing capabilities of the reference stream processor
(``ps2warpgate/streamclient``, surveyed in SURVEY.md), extended with
the relational + LLM-data-pipeline operator surface of SURVEY.md §2B.

Design stance (SURVEY.md §7): a *library-shaped engine* — typed
schemas, source/sink adapters, and an operator library that is a thin,
tested layer over DataFrame/SQL builtins. No custom Catalyst rules;
custom code is confined to the streaming replay source, the keyed
state-lifecycle operator, and the dedup/similarity compositions.

Every public operator is registered in :mod:`streamclient_spark.plans.registry`
under a stable query name, together with its DuckDB oracle SQL, which is
what ``__spark_entry__.py`` exposes to the driver.
"""

from streamclient_spark.session import get_spark
from streamclient_spark.plans.registry import REGISTRY, register

__all__ = ["get_spark", "REGISTRY", "register"]

__version__ = "0.1.0"
