"""tpuseg.core"""
