"""Demo-query registrations fulfilling the driver contract.

Each submodule registers queries via hiero_spark.registry.query; importing
this package populates the registry. Grouping follows SURVEY.md §2.
"""

from hiero_spark.queries import (  # noqa: F401
    flagship,
    flagship2,
    sketches,
    filters,
    derived,
    relational,
    streaming,
    northstar,
    sources,
    progressive,
    pipeline,
    curation,
    retrieval,
)
