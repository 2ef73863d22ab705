"""tpuseg.engine"""
