"""tpuseg.data"""
