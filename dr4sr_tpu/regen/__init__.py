from dr4sr_tpu.regen.miner import brute_force_patterns, match_pairs, mine_patterns  # noqa: F401
