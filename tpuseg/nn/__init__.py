"""tpuseg.nn"""
