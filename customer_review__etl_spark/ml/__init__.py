"""ML layer (SURVEY.md §2.7, M1-M9): TF-IDF → LDA topics → theme
labels, and the TF-IDF → RandomForest classifier with metrics —
re-expressed as pyspark.ml Pipelines with the reference's exact
hyperparameters (k=5, maxIter=20, seed=42, vocab 1000, numTrees=100;
cleaner.py:176-270).
"""
