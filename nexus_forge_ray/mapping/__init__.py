from nexus_forge_ray.mapping.rules import Mapping, parse_hjson
from nexus_forge_ray.mapping.mapper import DictionaryMapper, RuleContext, map_dataset

__all__ = ["Mapping", "parse_hjson", "DictionaryMapper", "RuleContext", "map_dataset"]
