"""tpuseg.utils"""
