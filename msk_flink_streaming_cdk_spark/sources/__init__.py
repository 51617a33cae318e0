from .fixtures import TABLES, load_table, load_tables, register_views, sensor_readings

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "sensor_readings",
]
