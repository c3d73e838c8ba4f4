from unstract_spark.sources.catalog import (  # noqa: F401
    FilePattern,
    list_files,
    build_catalog,
)
