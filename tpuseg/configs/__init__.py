"""tpuseg.configs — named model presets (the reference's --config surface)."""
