from .attention import sdpa, sdpa_reference  # noqa: F401
