from nexus_forge_ray.state.lineage import (PartitionManifest, PartitionedRunner,
                                           actions_summary)

__all__ = ["PartitionManifest", "PartitionedRunner", "actions_summary"]
