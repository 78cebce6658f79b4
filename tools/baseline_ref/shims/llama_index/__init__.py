"""llama-index stand-in for the baseline measurement (BASELINE.md step 2).

Implements exactly the surface the reference's faiss pipeline imports
(document_processor.py:28-36), with the library's documented behavior:
SimpleDirectoryReader walks a directory and builds one Document per file
via the file_metadata callback; MarkdownNodeParser splits each document
into heading-delimited TextNodes; VectorStoreIndex embeds every node
through Settings.embed_model (batch API) and adds the vectors to the
faiss index; StorageContext.persist writes docstore + vector-store
artifacts. The embedder is this repo's deterministic mock
(rag_content_spark.embedding.mock._mock_embed_one) so both engines pay
an identical per-chunk embedding cost.
"""
