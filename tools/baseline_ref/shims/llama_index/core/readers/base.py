class BaseReader:
    """Reader interface: load_data(file, extra_info) -> list[Document]."""

    def load_data(self, file, extra_info=None):  # pragma: no cover
        raise NotImplementedError
