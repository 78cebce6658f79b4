"""Document sources (SURVEY §2.1)."""
