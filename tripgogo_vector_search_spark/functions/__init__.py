from . import vector, text, hashing  # noqa: F401
