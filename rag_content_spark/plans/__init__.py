"""End-to-end pipelines (build + query)."""
