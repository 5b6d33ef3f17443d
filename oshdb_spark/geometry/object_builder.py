"""Object-level geometry construction over the osm_types value objects —
the analog of OSHDBGeometryBuilderInternal
(/root/reference/oshdb-util/src/main/java/org/heigit/ohsome/oshdb/util/
geometry/OSHDBGeometryBuilderInternal.java:60-430).

The engine's hot path builds geometries columnar (operators/geometry_ops.py
drives geometry/builder.py over Arrow batches); this facade exposes the
same construction rules over single OSM* objects for user code — the
reference's public `OSHDBGeometryBuilder.getGeometry(entity, timestamp |
auxiliaryData)` surface — and reuses the exact same kernels
(build_multipolygon_geometry etc.), so both paths share one set of
assembly rules by construction.

Two resolution modes, as in the reference:
* ``AuxiliaryData(child_entity_data, child_way_nodes_data)`` — the caller
  already resolved the referenced entities (positional, matching
  ``get_members()`` order; OSHDBGeometryBuilderInternal.java:72-76);
* a timestamp — members resolve through the wired OSH containers
  (``OSMMember.get_entity()`` → ``get_by_timestamp``), mirroring
  ``way.getMemberEntities(timestamp)``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

from oshdb_spark.geometry.builder import build_multipolygon_geometry
from oshdb_spark.geometry.model import (
    Geometry,
    geometry_collection,
    is_empty,
    line_string,
    point,
)
from oshdb_spark.osm_types import OSMEntity, OSMNode, OSMRelation, OSMWay


@dataclass(frozen=True)
class AuxiliaryData:
    """OSHDBGeometryBuilderInternal.AuxiliaryData (java:72-76): directly
    referenced child entities (way→nodes, relation→ways) positionally
    aligned with get_members(); for relations, the child-child node lists
    per member."""

    child_entity_data: Sequence[Optional[OSMEntity]]
    child_way_nodes_data: Optional[Sequence[Sequence[OSMNode]]] = None


class InterpreterAreaDecider:
    """Adapts the engine's columnar TagInterpreter
    (geometry/taginterpreter.py) to the object-level decider surface the
    reference passes into the builder (TagInterpreter.isArea /
    isMultipolygonOuterMember / isMultipolygonInnerMember)."""

    def __init__(self, interpreter):
        self.interpreter = interpreter

    def is_area(self, entity: OSMEntity) -> bool:
        tags = {t.key: t.value for t in entity.get_tags()}
        if isinstance(entity, OSMWay):
            refs = [m.get_id() for m in (entity.get_members() or ())]
            return self.interpreter.way_is_area(refs, tags)
        if isinstance(entity, OSMRelation):
            return self.interpreter.relation_is_area(tags)
        return False

    def is_outer(self, member) -> bool:
        return self.interpreter.is_outer_member(
            str(member.get_type()), member.get_role().get_id()
        )

    def is_inner(self, member) -> bool:
        return self.interpreter.is_inner_member(
            str(member.get_type()), member.get_role().get_id()
        )


def _node_tuples(nodes) -> list:
    """visible OSMNodes -> builder Node tuples (id, lon, lat)."""
    return [
        (n.get_id(), n.get_longitude(), n.get_latitude())
        for n in nodes
        if n is not None and n.is_visible()
    ]


class GeometryBuilder:
    """OSHDBGeometryBuilderInternal: area_decider + per-type construction."""

    def __init__(self, area_decider):
        self.area_decider = area_decider

    # -- dispatch (java:79-103) --------------------------------------------
    def get_geometry(self, entity: OSMEntity, aux_or_ts) -> Geometry:
        timestamp, aux = _split(aux_or_ts)
        if timestamp is not None:
            ts = getattr(timestamp, "epoch_second", timestamp)
            if ts < entity.get_epoch_second():
                raise AssertionError(
                    "cannot produce geometry of entity for timestamp before"
                    " this entity's version's timestamp"
                )
        if isinstance(entity, OSMNode):
            return self.get_node_geometry(entity)
        if isinstance(entity, OSMWay):
            return self.get_way_geometry(entity, aux_or_ts)
        if isinstance(entity, OSMRelation):
            return self._get_relation_geometry(entity, aux_or_ts)
        raise TypeError(
            "entity must be an instance of either OSMNode, OSMWay, or OSMRelation"
        )

    # -- node (java:127-140) -----------------------------------------------
    def get_node_geometry(self, node: OSMNode) -> Geometry:
        if not node.is_visible():
            return point()
        return point(node.get_longitude(), node.get_latitude())

    # -- way (java:152-230) --------------------------------------------------
    def get_way_geometry(self, way: OSMWay, aux_or_ts) -> Geometry:
        if not way.is_visible():
            return line_string([])  # empty (line) geometry
        timestamp, aux = _split(aux_or_ts)
        if aux is not None:
            resolved = list(aux.child_entity_data)
        else:
            resolved = list(way.get_member_entities(timestamp))
        coords = [[lon, lat] for _, lon, lat in _node_tuples(resolved)]
        if self.area_decider.is_area(way):
            if len(coords) >= 4 and coords[0] == coords[-1]:
                return {"type": "Polygon", "coordinates": [coords]}
            # doesn't form a linear ring - fall back to linestring
        if len(coords) >= 2:
            return line_string(coords)
        if len(coords) == 1:
            return point(*coords[0])
        return point()  # empty (point) geometry

    # -- relation (java:233-265) ---------------------------------------------
    def _get_relation_geometry(self, relation: OSMRelation, aux_or_ts) -> Geometry:
        if not relation.is_visible():
            return geometry_collection([])
        if self.area_decider.is_area(relation):
            try:
                mp = self.get_multipolygon_geometry(relation, aux_or_ts)
                if not is_empty(mp):
                    return mp
            except ValueError:
                pass  # fall back to geometry collection builder
        return self.get_geometry_collection_geometry(relation, aux_or_ts)

    # -- relation as multipolygon (java:360-430) -------------------------------
    def get_multipolygon_geometry(self, relation: OSMRelation, aux_or_ts) -> Geometry:
        timestamp, aux = _split(aux_or_ts)
        members = relation.get_members() or ()
        outer_lines: List[list] = []
        inner_lines: List[list] = []
        for i, member in enumerate(members):
            outer = self.area_decider.is_outer(member)
            inner = self.area_decider.is_inner(member)
            if not (outer or inner):
                continue
            if aux is not None:
                way_nodes = (
                    aux.child_way_nodes_data[i]
                    if aux.child_way_nodes_data is not None
                    else None
                )
            else:
                osh = member.get_entity()
                way = osh.get_by_timestamp(timestamp) if osh is not None else None
                way_nodes = (
                    list(way.get_member_entities(timestamp))
                    if way is not None and way.is_visible()
                    else None
                )
            if not way_nodes:
                continue
            (outer_lines if outer else inner_lines).append(_node_tuples(way_nodes))
        return build_multipolygon_geometry(outer_lines, inner_lines)

    # -- relation as collection (java:275-358) ---------------------------------
    def get_geometry_collection_geometry(
        self, relation: OSMRelation, aux_or_ts
    ) -> Geometry:
        timestamp, aux = _split(aux_or_ts)
        members = relation.get_members() or ()
        geoms = []
        for i, member in enumerate(members):
            if aux is not None:
                member_entity = aux.child_entity_data[i]
                sub = (
                    AuxiliaryData(aux.child_way_nodes_data[i], None)
                    if aux.child_way_nodes_data is not None
                    else None
                )
            else:
                osh = member.get_entity()
                member_entity = (
                    osh.get_by_timestamp(timestamp) if osh is not None else None
                )
                sub = None
            if member_entity is None:
                # incomplete/redacted member: skipped, geometry not full
                continue
            geoms.append(
                self.get_geometry(member_entity, sub if sub is not None else timestamp)
            )
        return geometry_collection(geoms)


def _split(aux_or_ts):
    """(timestamp, aux) from the overloaded second argument."""
    if isinstance(aux_or_ts, AuxiliaryData):
        return None, aux_or_ts
    return aux_or_ts, None
