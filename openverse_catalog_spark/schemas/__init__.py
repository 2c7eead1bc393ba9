from openverse_catalog_spark.schemas.columns import (  # noqa: F401
    ColumnSpec,
    Datatype,
    UpsertStrategy,
    AUDIO_TSV_COLUMNS,
    DB_ONLY_COLUMNS,
    IMAGE_TSV_COLUMNS,
    audio_db_schema,
    image_db_schema,
    spark_schema,
)
