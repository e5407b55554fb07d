"""Model templates + PathsWrapper — reference expectations from
tests/specializations/models/data.py (ACTIVITY_TEMPLATE family) and
kgforge/core/wrappings/paths.py."""

import pandas as pd
import pytest

from nexus_forge_ray.core.filters import Filter, apply_filters_frame
from nexus_forge_ray.core.paths import wrap_paths
from nexus_forge_ray.validation.shapes import PropertyConstraint, Shape
from nexus_forge_ray.validation.templates import template

ENTITY = Shape(target_type="Entity", constraints=[])

ACTIVITY = Shape(target_type="Activity", constraints=[
    PropertyConstraint(path="generated", min_count=1, node_shape=ENTITY),
    PropertyConstraint(path="status", min_count=1,
                       in_values=["completed", "pending"]),
    PropertyConstraint(path="startedAtTime", datatype="dateTime"),
    PropertyConstraint(path="endedAtTime", datatype="dateTime"),
    PropertyConstraint(path="validated", datatype="boolean"),
    PropertyConstraint(path="used", node_shape=ENTITY),
    PropertyConstraint(path="author", class_type="Person"),
])

BUILDING = Shape(target_type="Building", constraints=[
    PropertyConstraint(path="name", min_count=1, datatype="string"),
    PropertyConstraint(path="description", min_count=1, datatype="string"),
    PropertyConstraint(path="geo", node_shape=Shape(
        target_type="GeoCoordinates", constraints=[
            PropertyConstraint(path="latitude", min_count=1,
                               datatype="double"),
            PropertyConstraint(path="longitude", min_count=1,
                               datatype="double"),
        ])),
])

SHAPES = [ACTIVITY, BUILDING, ENTITY]


def test_activity_template_placeholders():
    t = template(SHAPES, "Activity")
    assert t["id"] == "" and t["type"] == "Activity"
    assert t["generated"] == {"id": "", "type": "Entity"}
    assert t["status"] == "completed"
    assert t["startedAtTime"] == "9999-12-31T00:00:00"
    assert t["validated"] is False
    assert t["author"] == {"id": "", "type": "Person"}
    # id/type lead, properties sorted after (hjson sort_attrs behavior)
    assert list(t)[:2] == ["id", "type"]
    assert list(t)[2:] == sorted(list(t)[2:])


def test_template_only_required():
    t = template(SHAPES, "Activity", only_required=True)
    assert set(t) == {"id", "type", "generated", "status"}


def test_nested_template_included():
    t = template(SHAPES, "Building")
    assert t["geo"] == {"id": "", "type": "GeoCoordinates",
                        "latitude": 0.0, "longitude": 0.0}


def test_unmanaged_type_raises():
    with pytest.raises(ValueError):
        template(SHAPES, "Rocket")


def test_wrap_paths_builds_filters():
    p = wrap_paths(template(SHAPES, "Building"))
    f = p.geo.latitude >= 45.0
    assert f == Filter(("geo", "latitude"), "__ge__", 45.0)
    f2 = p.name == "tower"
    assert f2 == Filter(("name",), "__eq__", "tower")


def test_wrapped_filters_drive_search():
    df = pd.DataFrame({"name": ["a", "b"], "geo.latitude": [46.2, 12.0]})
    p = wrap_paths({"name": "", "geo": {"latitude": 0.0}})
    hit = apply_filters_frame(df, [p.geo.latitude > 40.0])
    assert hit["name"].tolist() == ["a"]
