"""tpuseg.parallel"""
