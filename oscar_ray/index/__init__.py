"""Index build (resumable, two-stage) and postings reader."""

from oscar_ray.index.build import IndexBuildConfig, build_index
from oscar_ray.index.reader import IndexReader

__all__ = ["IndexBuildConfig", "build_index", "IndexReader"]
