from shaclapi_ray.shapes.ir import (  # noqa: F401
    Pred,
    Constraint,
    PredicateConstraint,
    OrConstraint,
    RefConstraint,
    UniqueConstraint,
    DriftConstraint,
    Shape,
    load_schema_dir,
    shape_from_dict,
)
from shaclapi_ray.shapes.dag import ConstraintDAG  # noqa: F401
