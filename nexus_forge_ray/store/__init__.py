from nexus_forge_ray.store.parquet_store import (
    ParquetStore, RegistrationError, UpdatingError, DeprecationError,
    TaggingError, RetrievalError,
)

__all__ = ["ParquetStore", "RegistrationError", "UpdatingError",
           "DeprecationError", "TaggingError", "RetrievalError"]
