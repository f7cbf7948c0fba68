from flusher_spark.sources.sheet import SheetGrid, SheetSource, cast_with_schema, infer_schema, read_sheet

__all__ = ["SheetGrid", "SheetSource", "cast_with_schema", "infer_schema", "read_sheet"]
