"""Import all query modules so registration side effects run."""

from ._core import ORACLES, QUERIES, register

from . import reference_q  # noqa: E402,F401
from . import relational_q  # noqa: E402,F401
from . import llm_q  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "register"]
