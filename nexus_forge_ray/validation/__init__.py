from nexus_forge_ray.validation.shapes import Shape, PropertyConstraint, validate_dataset

__all__ = ["Shape", "PropertyConstraint", "validate_dataset"]
