from multi_sensor_data_pipeline_for_robotics__spark.sources.tables import (
    TABLES,
    load_table,
    load_tables,
    register_views,
)

__all__ = ["TABLES", "load_table", "load_tables", "register_views"]
