// Empty stand-in: dsdgen's dist.h includes folly/Singleton.h but the
// compiled sources never reference a Singleton symbol.
#pragma once
