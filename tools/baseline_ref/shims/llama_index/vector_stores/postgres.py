class PGVectorStore:  # pragma: no cover - faiss baseline never constructs it
    @classmethod
    def from_params(cls, **kwargs):
        raise RuntimeError("postgres path not part of the baseline measurement")
