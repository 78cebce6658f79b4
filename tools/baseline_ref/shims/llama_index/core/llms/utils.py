class _NoLLM:
    metadata = {"model_name": "None"}


def resolve_llm(llm):
    return _NoLLM()
