/* Stub CL/cl.h — satisfies the unconditional #include in the reference's
 * ComFunc.h (include/ComFunc.h:33) when compiling the reference's CPU-only
 * stage files for the golden-dump harness. The CPU path (CVC.cpp,
 * fastguidedfilter.cpp, DispSel.cpp, PP.cpp, JointWMF.h) references zero
 * OpenCL symbols, so nothing needs to be defined here. */
#ifndef PSM_STUB_CL_H
#define PSM_STUB_CL_H
#endif
