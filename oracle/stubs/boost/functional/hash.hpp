/* Minimal stand-in for boost::hash_combine / boost::hash_range used by the
 * oracle build (real boost is not installed in this image).  Uses the classic
 * golden-ratio combiner.  The TPU framework implements the IDENTICAL scheme
 * (alfalfa_tpu/state/hashing.py) so state hashes / IVF entry minihashes agree
 * between the oracle fixtures and the framework. */
#ifndef ORACLE_BOOST_HASH_STUB
#define ORACLE_BOOST_HASH_STUB

#include <cstddef>
#include <cstdint>
#include <functional>

namespace boost
{

template <typename T>
struct hash
{
  std::size_t operator()( const T & v ) const { return std::hash<T>()( v ); }
};

/* integral types hash to their value, like classic boost */
template <> struct hash<uint8_t>  { std::size_t operator()( uint8_t v )  const { return v; } };
template <> struct hash<int8_t>   { std::size_t operator()( int8_t v )   const { return static_cast<std::size_t>( v ); } };
template <> struct hash<uint16_t> { std::size_t operator()( uint16_t v ) const { return v; } };
template <> struct hash<int16_t>  { std::size_t operator()( int16_t v )  const { return static_cast<std::size_t>( v ); } };
template <> struct hash<uint32_t> { std::size_t operator()( uint32_t v ) const { return v; } };
template <> struct hash<int32_t>  { std::size_t operator()( int32_t v )  const { return static_cast<std::size_t>( v ); } };
template <> struct hash<uint64_t> { std::size_t operator()( uint64_t v ) const { return v; } };
template <> struct hash<int64_t>  { std::size_t operator()( int64_t v )  const { return static_cast<std::size_t>( v ); } };
template <> struct hash<bool>     { std::size_t operator()( bool v )     const { return v; } };

template <typename T>
inline void hash_combine( std::size_t & seed, const T & v )
{
  seed ^= hash<T>()( v ) + 0x9e3779b9 + ( seed << 6 ) + ( seed >> 2 );
}

template <typename It>
inline void hash_range( std::size_t & seed, It first, It last )
{
  for ( ; first != last; ++first ) {
    hash_combine( seed, *first );
  }
}

} // namespace boost

#endif
