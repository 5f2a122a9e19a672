"""Source connectors: the extract layer lives in pipeline.sources
(HTTP JSON scans with failover) and io (parquet star schema); this
package is the stable import surface for both."""

from ..io import TABLES, load_tables, read_table, register_views  # noqa: F401
from ..pipeline.sources import (  # noqa: F401
    ExtractResult,
    enrich_users,
    fallback_users_df,
    load_json_sources_failsoft,
    load_users,
)
