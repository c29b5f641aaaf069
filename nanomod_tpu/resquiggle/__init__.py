from nanomod_tpu.resquiggle.pipeline import annotate_folder, annotate_files  # noqa: F401
