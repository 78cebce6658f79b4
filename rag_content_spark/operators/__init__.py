"""Operators: the engine's verbs over the documents/chunks DataFrames."""
