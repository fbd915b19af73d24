/* Stub display header for the oracle build (no OpenGL available).
 * xc-enc includes display.hh but never instantiates VideoDisplay. */
#ifndef ORACLE_DISPLAY_STUB_HH
#define ORACLE_DISPLAY_STUB_HH
#endif
