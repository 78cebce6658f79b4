"""sentence-transformers stand-in: only the llamastack path constructs
SentenceTransformer (document_processor.py:357); the faiss baseline path
never does. Provided so `import sentence_transformers` succeeds.
"""


class SentenceTransformer:
    def __init__(self, model_name_or_dir: str):
        self.model_name_or_dir = model_name_or_dir

    def get_sentence_embedding_dimension(self) -> int:
        return 768
