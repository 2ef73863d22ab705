"""tpuseg.models"""
