"""Model layer: state, initialization, factor updates, merging, pipeline."""
