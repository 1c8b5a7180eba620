// e1m1 regression batch (BASELINE configs #3/#4 gate, VERDICT r3 #2).
// Full import path: glTF map load -> textured atlas -> cluster backend ->
// sky bake (SKY panels, scene.py has_sky) -> autoexposure, then the
// calibrated e1m1 pt_gate band asserts convergence with a nonzero exit
// on drift.  Ref analog: CmdLoadMap + pt_test, render_system.c:1348-1464.
// NOTE: comments must not contain semicolons (they split statements).
// Run: python -m pim_tpu.app --width 128 --height 128 --exec "exec scripts/pt_test_e1m1.cmd"
mapload e1m1
teleport -2.5 1.7 -2.5
lookat 6 1 6
pt_denoise 0
exp_manual 0
pt_trace 1
wait 64
pt_stddev
pt_gate -scene e1m1
screenshot e1m1_gate
pt_trace 0
quit
