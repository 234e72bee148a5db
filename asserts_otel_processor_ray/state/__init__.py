"""Run state: lineage manifests, checkpoints, broadcastable stores."""
