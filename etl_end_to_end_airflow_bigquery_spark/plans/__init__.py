from .oracles import ORACLES as _CORE_ORACLES
from .oracles_ext import EXT_ORACLES
from .queries import QUERIES as _CORE_QUERIES
from .queries_ext import EXT_QUERIES

QUERIES = {**_CORE_QUERIES, **EXT_QUERIES}
ORACLES = {**_CORE_ORACLES, **EXT_ORACLES}

__all__ = ["QUERIES", "ORACLES"]
