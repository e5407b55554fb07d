from nexus_forge_ray.resolving.strategies import ResolvingStrategy
from nexus_forge_ray.resolving.dictionary import DictionaryResolver, ResolverActor
from nexus_forge_ray.resolving.embedding import EmbeddingLinker, LinkerActor

__all__ = ["ResolvingStrategy", "DictionaryResolver", "ResolverActor",
           "EmbeddingLinker", "LinkerActor"]
