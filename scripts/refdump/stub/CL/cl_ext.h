/* Stub CL/cl_ext.h — see cl.h in this directory. */
#ifndef PSM_STUB_CL_EXT_H
#define PSM_STUB_CL_EXT_H
#endif
