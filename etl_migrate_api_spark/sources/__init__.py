from etl_migrate_api_spark.sources.http_cursor import CursorSource, fetch_http_page

__all__ = ["CursorSource", "fetch_http_page"]
