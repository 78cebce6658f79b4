"""Network-refusing requests stand-in. The baseline runs hermetic
(MetadataProcessor(hermetic_build=True)), so ping_url is never called;
any accidental call fails loudly instead of touching the network.
"""


class exceptions:  # noqa: N801 - mirrors requests.exceptions namespace
    class RequestException(Exception):
        pass


def get(url, timeout=None):  # pragma: no cover - must not be reached
    raise exceptions.RequestException(
        f"network disabled in baseline harness (attempted GET {url})"
    )
