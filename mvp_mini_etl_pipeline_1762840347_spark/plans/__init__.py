from .registry import QUERIES, ORACLES, query  # noqa: F401

# Importing the modules populates the registry.
from . import parity  # noqa: F401,E402
from . import events  # noqa: F401,E402
from . import dedup  # noqa: F401,E402
from . import similarity  # noqa: F401,E402
from . import text  # noqa: F401,E402
from . import multimodal  # noqa: F401,E402
from . import relational  # noqa: F401,E402
from . import analytics  # noqa: F401,E402
from . import graph  # noqa: F401,E402
from . import subqueries  # noqa: F401,E402
from . import quality  # noqa: F401,E402
from . import sketches  # noqa: F401,E402
from . import packing  # noqa: F401,E402
from . import warehouse  # noqa: F401,E402
from . import scrub  # noqa: F401,E402
from . import evaluation  # noqa: F401,E402
