"""Import every query module so the registry is fully populated."""

from . import tpch  # noqa: F401
from . import tpch_advanced  # noqa: F401
from . import tpch_remaining  # noqa: F401
from . import scd_queries  # noqa: F401
from . import pipeline  # noqa: F401
from . import streaming_queries  # noqa: F401
from . import temporal_queries  # noqa: F401
from . import multimodal_queries  # noqa: F401
from . import warehouse_extra  # noqa: F401
from . import analytics_extra  # noqa: F401
from . import window_extra  # noqa: F401
from . import curation_extra  # noqa: F401
from . import mv_queries  # noqa: F401
from . import identity_queries  # noqa: F401
from . import relational_extra  # noqa: F401
from . import sql_dml  # noqa: F401
