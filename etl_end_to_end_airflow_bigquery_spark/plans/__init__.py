from .oracles import ORACLES as _CORE_ORACLES
from .oracles_ext import EXT_ORACLES
from .oracles_olap import OLAP_ORACLES
from .queries import QUERIES as _CORE_QUERIES
from .queries_ext import EXT_QUERIES
from .queries_olap import OLAP_QUERIES
from .queries_stream import STREAM_QUERIES
from .oracles_stream import STREAM_ORACLES

QUERIES = {**_CORE_QUERIES, **EXT_QUERIES, **STREAM_QUERIES, **OLAP_QUERIES}
ORACLES = {**_CORE_ORACLES, **EXT_ORACLES, **STREAM_ORACLES, **OLAP_ORACLES}

__all__ = ["QUERIES", "ORACLES"]
