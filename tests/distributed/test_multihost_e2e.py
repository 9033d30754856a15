"""Config-5 topology end-to-end on CPU (VERDICT r4 #6): EngineCore +
scheduler + broadcaster in THIS process, a follower in a SEPARATE OS
process with its own JAX runtime and virtual device mesh, token equality
asserted across the process boundary, and SIGKILL-mid-stream surfacing
FollowerDeadError. All machinery is the production path
(parallel/control_plane.py, parallel/selfcheck.py)."""


def test_follower_process_lockstep_and_kill():
    from aphrodite_tpu.parallel.selfcheck import follower_e2e_check
    summary = follower_e2e_check(tp=2, follower_devices=4, kill_test=True)
    assert summary["token_equal"]
    assert summary["followed_steps"] > 0
    assert summary["kill_detected"]
