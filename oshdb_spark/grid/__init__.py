from oshdb_spark.grid.xygrid import (  # noqa: F401
    MAXZOOM,
    XYGrid,
    XYGridTree,
    from_level_id,
    get_level_id,
    to_osm,
    to_wgs84,
    xy_cell_id_vec,
    xy_insert_cell_vec,
)
from oshdb_spark.grid.quadcell import (  # noqa: F401
    quadcell_id_vec,
    quadcell_parent,
    quadcell_token,
    quadcell_to_bbox,
)
