"""tpuseg.ops"""
