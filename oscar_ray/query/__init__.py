"""Query side: parser, set-op kernels, BM25 scorer, engine."""

from oscar_ray.query.parser import parse_query, QueryParseError
from oscar_ray.query.engine import QueryEngine

__all__ = ["parse_query", "QueryParseError", "QueryEngine"]
