"""Exception classes (cugraph ``exceptions.py``).

The engine's native definition lives in ``operators/pagerank.py`` (it
subclasses RuntimeError and is raised by every convergence-checked
iterative operator); this module mirrors the reference's
``cugraph.exceptions`` import path.
"""

from .operators.pagerank import FailedToConvergeError  # noqa: F401

__all__ = ["FailedToConvergeError"]
