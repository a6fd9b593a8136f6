from . import regex_lib, text_utils  # noqa: F401
