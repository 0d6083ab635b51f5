from .kernels import distance, similarity  # noqa: F401
from .tokenize import ngrams, tokenize, words  # noqa: F401
from .unicode import fold_chars_positional, fold_string  # noqa: F401
