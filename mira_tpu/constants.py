"""Global protocol constants (reference /root/reference/src/constants.rs)."""

MAX_BITS = 255
# hashes are truncated to this many bits before field interpretation
NUM_HASH_BITS = 250
NUM_CHALLENGE_BITS = 128
