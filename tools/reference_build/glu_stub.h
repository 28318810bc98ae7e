// stub glu for headless build: declarations only; definitions in stubs.cpp
#pragma once
#ifdef __cplusplus
extern "C" {
#endif
void gluLookAt(double, double, double, double, double, double, double, double, double);
void gluPerspective(double, double, double, double);
#ifdef __cplusplus
}
#endif
