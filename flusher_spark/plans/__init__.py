from flusher_spark.plans.catalog import CatalogEntry, register, registry

__all__ = ["CatalogEntry", "register", "registry"]
