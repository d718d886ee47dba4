"""Query registry package — import all plan modules to populate QUERIES/ORACLES."""

from .registry import AS_OF, AS_OF_DATE, ORACLES, QUERIES, query  # noqa: F401

# Each import registers its queries as a side effect.
from . import flagship  # noqa: F401,E402
from . import projections  # noqa: F401,E402
from . import joins  # noqa: F401,E402
from . import aggregates  # noqa: F401,E402
from . import windows  # noqa: F401,E402
from . import gold  # noqa: F401,E402
from . import text  # noqa: F401,E402
from . import dedup  # noqa: F401,E402
from . import similarity  # noqa: F401,E402
from . import streaming  # noqa: F401,E402
from . import multimodal  # noqa: F401,E402
from . import advanced  # noqa: F401,E402
from . import classic  # noqa: F401,E402
from . import tpch_more  # noqa: F401,E402
from . import timeseries  # noqa: F401,E402
from . import training  # noqa: F401,E402
from . import tpch2  # noqa: F401,E402
