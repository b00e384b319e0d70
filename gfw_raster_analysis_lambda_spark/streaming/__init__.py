from .incremental import incremental_zonal, read_incremental_result  # noqa: F401
