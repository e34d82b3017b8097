"""Named query builders (SURVEY.md §2.B inventory + extensions).

Importing this package registers every query into
``hephaestus_spark.registry.QUERIES`` / ``ORACLES``.
"""

from hephaestus_spark.registry import load_all

load_all()
