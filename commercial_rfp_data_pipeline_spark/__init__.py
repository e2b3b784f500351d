"""commercial_rfp_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capability surface of the reference
repo ``Dharmaraj777/commercial_rfp_data_pipeline`` (an eager, single-process
pandas ETL pipeline) as a lazy, distributed, Catalyst-optimized Spark
engine, extended with the operators a large-scale LLM training-data
pipeline needs (dedup, similarity search, multimodal columns, text
analysis).

Design principles (SURVEY.md §7):
- every operator is a pure ``DataFrame -> DataFrame`` function;
- all order-sensitive semantics (dedup survivors, argmax tie-breaks)
  thread an explicit ordinal column — pandas "source order" has no
  distributed equivalent;
- built-in ``pyspark.sql.functions`` everywhere; Pandas UDFs only where
  column expressions genuinely cannot express the semantics
  (multimodal decode); no row-at-a-time Python UDFs in hot paths;
- parquet-first I/O, overwrite-rebuild sink semantics.
"""

from commercial_rfp_data_pipeline_spark.session import get_spark


def _register_self_contained_pickling() -> None:
    """Serialize this package's functions BY VALUE in Spark closures.

    mapInPandas / applyInPandasWithState closures that reference
    module-level helpers are otherwise pickled by reference, and the
    executor-side Python workers then need the package importable —
    true on a real cluster (wheel on PYTHONPATH / --py-files) but NOT
    when a driver harness imports this repo from an arbitrary cwd via
    sys.path. Pickle-by-value makes every shipped closure
    self-contained, so the engine works no matter how the repo landed
    on the driver's path."""
    try:
        import sys

        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:  # pragma: no cover — older pyspark layouts
        pass


_register_self_contained_pickling()

__all__ = ["get_spark"]
__version__ = "0.1.0"
