"""tpuseg.weights"""
