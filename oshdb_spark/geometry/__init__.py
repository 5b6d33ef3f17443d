from oshdb_spark.geometry.model import (  # noqa: F401
    bounds,
    from_wkt,
    geometry_collection,
    is_empty,
    line_string,
    multi_polygon,
    pack_geometry,
    point,
    polygon,
    to_wkt,
    unpack_geometry,
)
from oshdb_spark.geometry.geo import (  # noqa: F401
    area_of,
    bearing_radians,
    length_of,
    roundness,
    squareness,
)
from oshdb_spark.geometry.pip import (  # noqa: F401
    bbox_in_polygon,
    bbox_outside_polygon,
    points_in_polygon,
)
from oshdb_spark.geometry.clip import clip_to_bbox  # noqa: F401
